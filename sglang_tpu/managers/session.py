"""Multi-turn sessions (reference `srt/session/` + `Engine.open_session`,
`engine.py:908`).

A session stores the accumulated token history server-side so each turn
sends only its delta; KV reuse across turns comes from the radix prefix
cache matching the stored history (the reference wires sessions into req
chaining the same way — the tree IS the session KV store).
"""

from __future__ import annotations

import threading
import time
import uuid
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class Session:
    sid: str
    token_ids: List[int] = field(default_factory=list)
    created: float = field(default_factory=time.monotonic)
    last_used: float = field(default_factory=time.monotonic)
    capacity: Optional[int] = None  # max history tokens


class SessionManager:
    def __init__(self, max_sessions: int = 1024):
        self._sessions: Dict[str, Session] = {}
        self._lock = threading.Lock()
        self.max_sessions = max_sessions

    def open(self, capacity: Optional[int] = None, sid: Optional[str] = None) -> str:
        with self._lock:
            if len(self._sessions) >= self.max_sessions:
                # evict the least-recently-used session
                lru = min(self._sessions.values(), key=lambda s: s.last_used)
                del self._sessions[lru.sid]
            sid = sid or uuid.uuid4().hex
            self._sessions[sid] = Session(sid=sid, capacity=capacity)
            return sid

    def close(self, sid: str) -> bool:
        with self._lock:
            return self._sessions.pop(sid, None) is not None

    def get(self, sid: str) -> Optional[Session]:
        with self._lock:
            s = self._sessions.get(sid)
            if s is not None:
                s.last_used = time.monotonic()
            return s

    def prepare_input(self, sid: str, new_ids: List[int]) -> List[int]:
        """Full input for this turn = stored history + the new delta."""
        s = self.get(sid)
        if s is None:
            raise ValueError(f"unknown session {sid}")
        return s.token_ids + list(new_ids)

    def commit_turn(self, sid: str, full_ids: List[int]) -> None:
        """Store the turn's full sequence (prompt + generated)."""
        s = self.get(sid)
        if s is None:
            return
        s.token_ids = list(full_ids)
        if s.capacity is not None and len(s.token_ids) > s.capacity:
            s.token_ids = s.token_ids[-s.capacity :]
