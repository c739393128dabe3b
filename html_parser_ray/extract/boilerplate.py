"""Boilerplate-strip heuristics over the index-array DOM.

The reference has no boilerplate module — this layer is owned by this repo
(north_star in BASELINE.json): tag/selector-based block classification plus
text-density and link-density scoring, built on the engine's selector matcher
and innerText semantics so the *text* of every kept block is exactly the
reference-semantics extracted text.

Deterministic by construction: same DOM in, same block decisions out.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from html_parser_ray.html.text import NormState, decode_normalize_segment
from html_parser_ray.html.tokenizer import KIND_ELEMENT, KIND_TEXT

# Subtrees dropped wholesale: scripts/styles are never content; nav/chrome
# elements are boilerplate by role.
DEFAULT_DROP_TAGS = frozenset(
    b"script style noscript template nav header footer aside form iframe "
    b"button select option label svg head title".split()
)

# class/id substrings that mark chrome blocks (checked on block elements only)
DEFAULT_DROP_CLASS_SUBSTRINGS = (
    b"sidebar", b"advert", b"banner", b"cookie", b"popup",
    b"share", b"social", b"comment", b"related", b"menu", b"breadcrumb",
)
DEFAULT_DROP_CLASS_TOKENS = (b"ad", b"ads", b"nav", b"footer", b"header")

# block-level elements that form candidate text blocks
BLOCK_TAGS = frozenset(
    b"p div article section main li td th blockquote pre h1 h2 h3 h4 h5 h6 "
    b"dd dt figcaption caption summary".split()
)

LINK_TAG = b"a"


@dataclass(frozen=True)
class ExtractConfig:
    """Extraction thresholds (part of this engine's spec, pinned by tests)."""

    drop_tags: frozenset = DEFAULT_DROP_TAGS
    drop_class_substrings: tuple = DEFAULT_DROP_CLASS_SUBSTRINGS
    drop_class_tokens: tuple = DEFAULT_DROP_CLASS_TOKENS
    # a block whose link-text/text ratio exceeds this is navigation-like
    max_link_density: float = 0.5
    # minimum normalized text length for a block to be emitted
    min_text_len: int = 1


def _class_id_marks_boilerplate(doc, idx: int, cfg: ExtractConfig) -> bool:
    attrs = doc.attrs(idx)
    blob_parts = []
    cls = attrs.get(b"class")
    if cls:
        blob_parts.append(cls.lower())
    id_ = attrs.get(b"id")
    if id_:
        blob_parts.append(id_.lower())
    if not blob_parts:
        return False
    blob = b" ".join(blob_parts)
    for sub in cfg.drop_class_substrings:
        if sub in blob:
            return True
    tokens = blob.split()
    for tok in cfg.drop_class_tokens:
        if tok in tokens:
            return True
    return False


def compute_drop_mask(doc, cfg: ExtractConfig) -> list[bool]:
    """Per-node boolean: True when the node lies inside a dropped subtree.

    Single preorder pass using subtree_end windows — the index-array analog of
    running the drop selectors and masking their subtrees.
    """
    n = len(doc.kind)
    mask = [False] * n
    drop_until = -1
    for i in range(1, n):
        if i <= drop_until:
            mask[i] = True
            continue
        if doc.kind[i] != KIND_ELEMENT:
            continue
        name = doc.name[i]
        if name in cfg.drop_tags or _class_id_marks_boilerplate(doc, i, cfg):
            mask[i] = True
            end = doc.subtree_end[i]
            if end > drop_until:
                drop_until = end
    return mask


def _link_mask(doc) -> list[bool]:
    """True for nodes inside an <a> subtree."""
    n = len(doc.kind)
    mask = [False] * n
    until = -1
    for i in range(1, n):
        if i <= until:
            mask[i] = True
            continue
        if doc.kind[i] == KIND_ELEMENT and doc.name[i] == LINK_TAG:
            mask[i] = True
            end = doc.subtree_end[i]
            if end > until:
                until = end
    return mask


def extract_text_blocks(doc, cfg: ExtractConfig | None = None) -> list[bytes]:
    """Main-content text blocks in document order.

    Algorithm:
    1. drop masked subtrees (tags + class/id heuristics);
    2. walk remaining *leaf-most* block elements (block elements with no block
       descendants carrying text) in preorder;
    3. per block, compute normalized reference-semantics text and the link
       density (normalized text length inside <a> vs total); blocks over
       ``max_link_density`` drop;
    4. emit surviving block texts in order.

    Text not under any block element (e.g. bare body text) attaches to the
    nearest enclosing emitted block via a catch-all document-level sweep.
    """
    if cfg is None:
        cfg = ExtractConfig()
    n = len(doc.kind)
    if n <= 1:
        return []
    drop = compute_drop_mask(doc, cfg)
    link = _link_mask(doc)
    kind = doc.kind
    names = doc.name
    parent = doc.parent
    sub_end = doc.subtree_end
    src = doc.source
    ns, ne = doc.name_start, doc.name_end

    # ownership: each text node belongs to its nearest block-element ancestor
    # (or pseudo-block 0 = document). Emit blocks in order of first text node.
    block_of_text: dict[int, int] = {}
    # find nearest block ancestor per text node
    for i in range(1, n):
        if kind[i] != KIND_TEXT or drop[i]:
            continue
        a = parent[i]
        owner = 0
        while a != 0 and a != 0xFFFFFFFF:
            if kind[a] == KIND_ELEMENT and names[a] in BLOCK_TAGS:
                owner = a
                break
            a = parent[a]
        block_of_text[i] = owner

    # group text nodes per owner in document order
    order: list[int] = []
    texts_by_owner: dict[int, list[int]] = {}
    for t, owner in block_of_text.items():
        if owner not in texts_by_owner:
            texts_by_owner[owner] = []
            order.append(owner)
        texts_by_owner[owner].append(t)

    blocks: list[bytes] = []
    for owner in order:
        text_nodes = texts_by_owner[owner]
        out = bytearray()
        link_out = bytearray()
        state = NormState()
        link_state = NormState()
        for t in text_nodes:
            seg = src[ns[t] : ne[t]]
            decode_normalize_segment(out, seg, state)
            if link[t]:
                decode_normalize_segment(link_out, seg, link_state)
        total = len(out)
        if total < cfg.min_text_len:
            continue
        if total > 0 and len(link_out) / total > cfg.max_link_density:
            continue
        blocks.append(bytes(out))
    return blocks
