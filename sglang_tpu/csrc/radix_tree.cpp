// Native radix prefix-cache tree (C ABI).
//
// Parity with reference `srt/mem_cache/cpp_radix_tree/tree_v2.cpp` (~3k LoC
// C++ + pybind): the host-side RadixAttention tree re-designed for this
// engine's fused page-refcount protocol. Page-aligned keys, LRU leaf
// eviction, lock refs gating eviction. Page *lifetime* stays owned by the
// Python PageAllocator: insert/evict report which pages gained/lost a tree
// reference and Python adjusts refcounts, so the C++ side holds no
// allocator state. Bound via ctypes (no pybind11 in the image).
//
// Build: see sglang_tpu/csrc/build.py (g++ -O2 -shared -fPIC).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <map>
#include <unordered_map>
#include <vector>

namespace {

struct Node {
    Node* parent = nullptr;
    // first-page key -> child
    std::unordered_map<uint64_t, Node*> children;
    std::vector<int32_t> key;     // token ids, length % page_size == 0
    std::vector<int32_t> pages;   // one per page of key
    int64_t lock_ref = 0;
    uint64_t last_access = 0;

    bool evictable() const { return lock_ref == 0 && children.empty(); }
};

uint64_t hash_page(const int32_t* ids, int n) {
    // FNV-1a over the page's token ids
    uint64_t h = 1469598103934665603ull;
    for (int i = 0; i < n; i++) {
        h ^= (uint64_t)(uint32_t)ids[i];
        h *= 1099511628211ull;
    }
    return h;
}

struct Tree {
    Node root;
    int page_size;
    uint64_t clock = 0;
    int64_t evictable_pages = 0;
    int64_t total_pages = 0;

    uint64_t tick() { return ++clock; }
};

void free_subtree(Node* n) {
    for (auto& kv : n->children) {
        free_subtree(kv.second);
        delete kv.second;
    }
    n->children.clear();
}

// common page-aligned prefix length between ids[pos..n) and node key
int common_len(Tree* t, const int32_t* ids, int n, int pos, const Node* c) {
    int limit = std::min((int)c->key.size(), n - pos);
    int i = 0;
    while (i < limit && ids[pos + i] == c->key[i]) i++;
    return (i / t->page_size) * t->page_size;
}

Node* split_node(Tree* t, Node* node, int length) {
    Node* upper = new Node();
    int ps = t->page_size;
    upper->parent = node->parent;
    upper->key.assign(node->key.begin(), node->key.begin() + length);
    upper->pages.assign(node->pages.begin(), node->pages.begin() + length / ps);
    upper->lock_ref = node->lock_ref;
    upper->last_access = node->last_access;
    uint64_t up_hash = hash_page(upper->key.data(), ps);
    upper->parent->children[up_hash] = upper;
    node->key.erase(node->key.begin(), node->key.begin() + length);
    node->pages.erase(node->pages.begin(), node->pages.begin() + length / ps);
    node->parent = upper;
    upper->children[hash_page(node->key.data(), ps)] = node;
    return upper;
}

}  // namespace

extern "C" {

void* rt_new(int page_size) {
    Tree* t = new Tree();
    t->page_size = page_size;
    t->root.lock_ref = 1;
    return t;
}

void rt_free(void* h) {
    Tree* t = (Tree*)h;
    free_subtree(&t->root);
    delete t;
}

void rt_reset(void* h) {
    Tree* t = (Tree*)h;
    free_subtree(&t->root);
    t->evictable_pages = 0;
    t->total_pages = 0;
}

// Longest page-aligned cached prefix of ids[0..n).
// out_pages receives up to cap page ids; returns matched TOKEN count.
// *out_node receives the deepest matched node handle (for lock/unlock).
int64_t rt_match(void* h, const int32_t* ids, int64_t n, int32_t* out_pages,
                 int64_t cap, void** out_node) {
    Tree* t = (Tree*)h;
    int ps = t->page_size;
    Node* node = &t->root;
    int64_t pos = 0;
    int64_t aligned = (n / ps) * ps;
    int64_t np = 0;
    while (pos < aligned) {
        uint64_t hkey = hash_page(ids + pos, ps);
        auto it = node->children.find(hkey);
        if (it == node->children.end()) break;
        Node* c = it->second;
        int common = common_len(t, ids, (int)aligned, (int)pos, c);
        if (common == 0) break;
        if (common < (int)c->key.size()) c = split_node(t, c, common);
        c->last_access = t->tick();
        for (int i = 0; i < common / ps && np < cap; i++)
            out_pages[np++] = c->pages[i];
        pos += common;
        node = c;
        if (common < ps * (int)c->pages.size()) break;
    }
    *out_node = node == &t->root ? nullptr : (void*)node;
    return pos;
}

// Lock/unlock the path from node to root (admission pin).
void rt_lock(void* h, void* node_h, int delta) {
    Tree* t = (Tree*)h;
    Node* node = (Node*)node_h;
    while (node != nullptr && node != &t->root) {
        int64_t before = node->lock_ref;
        node->lock_ref += delta;
        if (before == 0 && node->lock_ref > 0)
            t->evictable_pages -= (int64_t)node->pages.size();
        else if (before > 0 && node->lock_ref == 0)
            t->evictable_pages += (int64_t)node->pages.size();
        node = node->parent;
    }
}

// Insert ids[0..n) (page-aligned n) backed by `pages`. Existing spans keep
// their pages; pages newly referenced by the tree are appended to
// out_new_pages (Python must inc_ref them). Returns their count.
int64_t rt_insert(void* h, const int32_t* ids, int64_t n,
                  const int32_t* pages, int32_t* out_new_pages, int64_t cap) {
    Tree* t = (Tree*)h;
    int ps = t->page_size;
    int64_t aligned = (n / ps) * ps;
    Node* node = &t->root;
    int64_t pos = 0;
    int64_t nnew = 0;
    while (pos < aligned) {
        uint64_t hkey = hash_page(ids + pos, ps);
        auto it = node->children.find(hkey);
        if (it == node->children.end()) {
            Node* leaf = new Node();
            leaf->parent = node;
            leaf->key.assign(ids + pos, ids + aligned);
            leaf->pages.assign(pages + pos / ps, pages + aligned / ps);
            leaf->last_access = t->tick();
            node->children[hkey] = leaf;
            for (size_t i = 0; i < leaf->pages.size() && nnew < cap; i++)
                out_new_pages[nnew++] = leaf->pages[i];
            t->evictable_pages += (int64_t)leaf->pages.size();
            t->total_pages += (int64_t)leaf->pages.size();
            return nnew;
        }
        Node* c = it->second;
        int common = common_len(t, ids, (int)aligned, (int)pos, c);
        if (common == 0) return nnew;  // hash collision on first page
        if (common < (int)c->key.size()) c = split_node(t, c, common);
        c->last_access = t->tick();
        pos += common;
        node = c;
    }
    return nnew;
}

// LRU-evict unlocked leaves until >= num_pages freed. Freed page ids go to
// out_pages (Python must free/decref them). Returns count freed.
int64_t rt_evict(void* h, int64_t num_pages, int32_t* out_pages, int64_t cap) {
    Tree* t = (Tree*)h;
    // collect evictable leaves into a min-heap by last_access
    typedef std::pair<uint64_t, Node*> Ent;
    std::vector<Ent> heap;
    std::vector<Node*> stack = {&t->root};
    while (!stack.empty()) {
        Node* n = stack.back();
        stack.pop_back();
        for (auto& kv : n->children) {
            if (kv.second->evictable())
                heap.push_back({kv.second->last_access, kv.second});
            stack.push_back(kv.second);
        }
    }
    auto cmp = [](const Ent& a, const Ent& b) { return a.first > b.first; };
    std::make_heap(heap.begin(), heap.end(), cmp);
    int64_t freed = 0;
    while (!heap.empty() && freed < num_pages) {
        std::pop_heap(heap.begin(), heap.end(), cmp);
        Node* victim = heap.back().second;
        heap.pop_back();
        if (!victim->evictable()) continue;
        for (size_t i = 0; i < victim->pages.size() && freed < cap; i++)
            out_pages[freed++] = victim->pages[i];
        t->evictable_pages -= (int64_t)victim->pages.size();
        t->total_pages -= (int64_t)victim->pages.size();
        Node* parent = victim->parent;
        parent->children.erase(hash_page(victim->key.data(), t->page_size));
        delete victim;
        if (parent != &t->root && parent->evictable())
            heap.push_back({parent->last_access, parent}),
                std::push_heap(heap.begin(), heap.end(), cmp);
    }
    return freed;
}

int64_t rt_evictable_pages(void* h) { return ((Tree*)h)->evictable_pages; }
int64_t rt_total_pages(void* h) { return ((Tree*)h)->total_pages; }

// ------------------------------------------------------------------ ngram

// Longest-suffix n-gram draft proposal (reference speculative/cpp_ngram/
// ngram.cpp): returns number of draft tokens written to out.
int64_t ngram_propose(const int32_t* toks, int64_t n, int min_match,
                      int max_match, int num_draft, int32_t* out) {
    if (n < min_match + 1) return 0;
    int hi = std::min((int64_t)max_match, n - 1);
    for (int m = hi; m >= min_match; m--) {
        const int32_t* suffix = toks + n - m;
        for (int64_t start = n - m - 1; start >= 0; start--) {
            if (memcmp(toks + start, suffix, m * sizeof(int32_t)) == 0) {
                int64_t cstart = start + m;
                int64_t avail = std::min((int64_t)num_draft, n - cstart);
                // exclude the matched suffix itself (cstart may reach into it)
                if (avail <= 0) break;
                memcpy(out, toks + cstart, avail * sizeof(int32_t));
                return avail;
            }
        }
    }
    return 0;
}

}  // extern "C"
