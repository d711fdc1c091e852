"""Conversation storage + /v1/conversations CRUD (OpenAI Conversations
API).

Parity with reference `sgl-model-gateway/src/routers/conversations/
handlers.rs` (create/get/update/delete conversation, item CRUD, metadata
validation) and its storage abstraction (`ConversationStorage` trait —
memory + persistent backends). Here: a thread-safe in-memory store with
an optional append-only JSONL journal for restart persistence (replayed
at startup), shared by the HTTP server's /v1/conversations routes and
the /v1/responses handler (`conversation` field context + write-back;
`previous_response_id` chaining via the response store).
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid
from collections import OrderedDict
from typing import Any, Dict, List, Optional, Tuple


def _now() -> int:
    return int(time.time())


def new_id(prefix: str) -> str:
    return f"{prefix}_{uuid.uuid4().hex[:24]}"


def validate_metadata(value) -> Tuple[Optional[dict], Optional[str]]:
    """Reference handlers.rs validate_metadata: dict of string->string,
    at most 16 pairs; None passes through."""
    if value is None:
        return None, None
    if not isinstance(value, dict):
        return None, "metadata must be an object"
    if len(value) > 16:
        return None, "metadata cannot have more than 16 keys"
    for k, v in value.items():
        if not isinstance(k, str) or not isinstance(v, str):
            return None, "metadata keys and values must be strings"
    return dict(value), None


def normalize_item(item: dict) -> Tuple[Optional[dict], Optional[str]]:
    """Validate + fill one conversation item (message form). Returns
    (item, error)."""
    if not isinstance(item, dict):
        return None, "item must be an object"
    typ = item.get("type", "message")
    if typ != "message":
        # store non-message items (mcp_call, reasoning, ...) opaquely
        out = dict(item)
        out.setdefault("id", new_id("item"))
        return out, None
    role = item.get("role")
    if role not in ("user", "assistant", "system", "developer", "tool"):
        return None, f"invalid role {role!r}"
    content = item.get("content", "")
    if isinstance(content, str):
        ctype = "output_text" if role == "assistant" else "input_text"
        content = [{"type": ctype, "text": content}]
    if not isinstance(content, list):
        return None, "content must be a string or list"
    return {
        "type": "message",
        "id": item.get("id") or new_id("msg"),
        "role": role,
        "status": item.get("status", "completed"),
        "content": content,
    }, None


def item_text(item: dict) -> str:
    """Flatten a message item's content parts to plain text."""
    content = item.get("content", "")
    if isinstance(content, str):
        return content
    return "".join(
        p.get("text", "")
        for p in content
        if isinstance(p, dict)
        and p.get("type") in ("input_text", "output_text", "text")
    )


class ConversationStorage:
    """In-memory conversation store with optional JSONL journal.

    The journal is append-only (one op per line: create/update/delete/
    item_add/item_del) and replayed on construction, so a router or
    server restart keeps conversations (reference gateway's persistent
    backends play this role)."""

    def __init__(self, journal_path: Optional[str] = None):
        self._lock = threading.RLock()
        self._convs: Dict[str, dict] = {}
        self._items: Dict[str, "OrderedDict[str, dict]"] = {}
        self._journal_path = journal_path
        self._journal = None
        if journal_path:
            if os.path.exists(journal_path):
                self._replay(journal_path)
            os.makedirs(os.path.dirname(journal_path) or ".", exist_ok=True)
            self._journal = open(journal_path, "a", encoding="utf-8")

    # ------------------------------------------------------------ journal

    def _replay(self, path: str):
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    op = json.loads(line)
                except json.JSONDecodeError:
                    continue  # torn tail write
                kind = op.get("op")
                if kind == "create":
                    c = op["conversation"]
                    self._convs[c["id"]] = c
                    self._items[c["id"]] = OrderedDict()
                elif kind == "update" and op["id"] in self._convs:
                    self._convs[op["id"]]["metadata"] = op["metadata"]
                elif kind == "delete":
                    self._convs.pop(op["id"], None)
                    self._items.pop(op["id"], None)
                elif kind == "item_add" and op["id"] in self._items:
                    it = op["item"]
                    self._items[op["id"]][it["id"]] = it
                elif kind == "item_del" and op["id"] in self._items:
                    self._items[op["id"]].pop(op["item_id"], None)

    def _log(self, op: dict):
        if self._journal is not None:
            self._journal.write(json.dumps(op) + "\n")
            self._journal.flush()

    # -------------------------------------------------------------- convs

    def create(self, metadata: Optional[dict]) -> dict:
        conv = {
            "id": new_id("conv"),
            "object": "conversation",
            "created_at": _now(),
            "metadata": metadata or {},
        }
        with self._lock:
            self._convs[conv["id"]] = conv
            self._items[conv["id"]] = OrderedDict()
            self._log({"op": "create", "conversation": conv})
        return dict(conv)

    def get(self, conv_id: str) -> Optional[dict]:
        with self._lock:
            c = self._convs.get(conv_id)
            return dict(c) if c else None

    def update_metadata(self, conv_id: str, patch: dict) -> Optional[dict]:
        """OpenAI patch semantics: null value deletes the key."""
        with self._lock:
            c = self._convs.get(conv_id)
            if c is None:
                return None
            md = dict(c.get("metadata") or {})
            for k, v in patch.items():
                if v is None:
                    md.pop(k, None)
                else:
                    md[k] = v
            c["metadata"] = md
            self._log({"op": "update", "id": conv_id, "metadata": md})
            return dict(c)

    def delete(self, conv_id: str) -> bool:
        with self._lock:
            if conv_id not in self._convs:
                return False
            del self._convs[conv_id]
            self._items.pop(conv_id, None)
            self._log({"op": "delete", "id": conv_id})
            return True

    # -------------------------------------------------------------- items

    def add_items(self, conv_id: str, items: List[dict]) -> Optional[List[dict]]:
        with self._lock:
            store = self._items.get(conv_id)
            if store is None:
                return None
            for it in items:
                store[it["id"]] = it
                self._log({"op": "item_add", "id": conv_id, "item": it})
            return [dict(i) for i in items]

    def list_items(
        self,
        conv_id: str,
        limit: int = 100,
        order: str = "asc",
        after: Optional[str] = None,
    ) -> Optional[dict]:
        with self._lock:
            store = self._items.get(conv_id)
            if store is None:
                return None
            seq = list(store.values())
        if order == "desc":
            seq = seq[::-1]
        if after is not None:
            ids = [i["id"] for i in seq]
            seq = seq[ids.index(after) + 1 :] if after in ids else []
        page = seq[: max(0, limit)]
        return {
            "object": "list",
            "data": [dict(i) for i in page],
            "first_id": page[0]["id"] if page else None,
            "last_id": page[-1]["id"] if page else None,
            "has_more": len(seq) > len(page),
        }

    def get_item(self, conv_id: str, item_id: str) -> Optional[dict]:
        with self._lock:
            store = self._items.get(conv_id)
            if store is None:
                return None
            it = store.get(item_id)
            return dict(it) if it else None

    def delete_item(self, conv_id: str, item_id: str) -> Optional[dict]:
        """Returns the (updated) conversation, per the OpenAI API."""
        with self._lock:
            store = self._items.get(conv_id)
            if store is None or item_id not in store:
                return None
            del store[item_id]
            self._log({"op": "item_del", "id": conv_id, "item_id": item_id})
            return dict(self._convs[conv_id])

    def messages_for_context(self, conv_id: str) -> Optional[List[dict]]:
        """Conversation items -> chat-template messages (oldest first)."""
        with self._lock:
            store = self._items.get(conv_id)
            if store is None:
                return None
            items = list(store.values())
        out = []
        for it in items:
            if it.get("type") != "message":
                continue
            role = it.get("role", "user")
            if role in ("developer", "tool"):
                role = {"developer": "system", "tool": "user"}[role]
            out.append({"role": role, "content": item_text(it)})
        return out


class ResponseStore:
    """Bounded LRU of completed /v1/responses payloads + their message
    context, enabling `previous_response_id` chaining (reference
    gateway's response persistence; `routers/openai/responses`)."""

    def __init__(self, capacity: int = 1024):
        self.capacity = capacity
        self._lock = threading.Lock()
        self._store: "OrderedDict[str, dict]" = OrderedDict()

    def put(self, response_id: str, response: dict, messages: List[dict]):
        with self._lock:
            self._store[response_id] = {
                "response": response,
                "messages": messages,
            }
            self._store.move_to_end(response_id)
            while len(self._store) > self.capacity:
                self._store.popitem(last=False)

    def get(self, response_id: str) -> Optional[dict]:
        with self._lock:
            e = self._store.get(response_id)
            if e is not None:
                self._store.move_to_end(response_id)
            return e
