"""Vectorized scalar text functions for the training-data pipelines.

Everything operates on whole Arrow/numpy batches where possible; per-string
Python work is limited to operations with no vectorized kernel (minhash over
shingle sets). All hashes are deterministic (no PYTHONHASHSEED dependence).
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pyarrow as pa

_RE_TOKEN = re.compile(r"\S+")
# BPE-ish subword split: runs of letters, digits, or single punctuation
_RE_BPE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")

STOPWORDS = frozenset(
    "the a an and or of to in is are was were be on for with as at by it this "
    "that from".split()
)

# tiny language-ID: characteristic function words per language (n-gram/word
# heuristic; deterministic, dependency-free)
_LANG_MARKERS = {
    "en": frozenset("the and of to is in that it was for with as his".split()),
    "fr": frozenset("le la les de et un une est dans que pour sur avec".split()),
    "de": frozenset("der die das und ist ein eine nicht mit von zu für".split()),
    "es": frozenset("el la los las de y un una es en que por con para".split()),
    "zh": frozenset(),  # CJK detected by codepoint range
}


def tokens(text: "str | None") -> list[str]:
    """\\S+ tokens; NULL text has none (the documents-table null contract:
    a NULL doc must not crash any operator — SQL drops it from token ops)."""
    return _RE_TOKEN.findall(text) if text is not None else []


def token_count(text: "str | None") -> int:
    return len(tokens(text))


def sql_token_count(text: "str | None") -> int:
    """``len(string_split(text, ' '))`` parity — THE single-space token
    convention every SQL-checked operator shares: '' counts as 1 token
    (string_split('', ' ') = ['']), NULL counts as 0 (SUM skips NULL).
    One definition so the convention can't drift per call site (the
    round-5 falsy-guard bug had to be patched at three copies)."""
    return len(text.split(" ")) if text is not None else 0


def bpe_token_count(text: str) -> int:
    """Subword-ish token count (whitespace + BPE-ish regex)."""
    return len(_RE_BPE.findall(text))


def token_count_batch(col: pa.Array) -> np.ndarray:
    """Vectorized-ish token counts for a string column."""
    return np.fromiter(
        (len(_RE_TOKEN.findall(s)) if s else 0 for s in col.to_pylist()),
        dtype=np.int64,
        count=len(col),
    )


def quality_features(text: str) -> dict:
    """Deterministic quality features: token/stopword/punct counts, mean word
    length (as integer micro-units to stay hash-exact)."""
    toks = tokens(text)
    n = len(toks)
    stop = sum(1 for t in toks if t.lower() in STOPWORDS)
    punct = sum(1 for c in text if not c.isalnum() and not c.isspace())
    total_len = sum(len(t) for t in toks)
    return {
        "n_tokens": n,
        "n_stopwords": stop,
        "n_punct": punct,
        "sum_token_len": total_len,
    }


def detect_language(text: "str | None") -> str:
    """Word-marker / codepoint heuristic language ID; NULL -> "unknown"."""
    if text is None:
        return "unknown"
    cjk = sum(1 for c in text[:400] if "一" <= c <= "鿿")
    if cjk > len(text[:400]) * 0.2:
        return "zh"
    toks = [t.lower() for t in tokens(text)[:200]]
    if not toks:
        return "unknown"
    best, best_score = "unknown", 0
    for lang, markers in _LANG_MARKERS.items():
        if not markers:
            continue
        score = sum(1 for t in toks if t in markers)
        if score > best_score:
            best, best_score = lang, score
    return best


def fingerprint64(text: str) -> int:
    """Rolling 64-bit document fingerprint (polynomial rolling hash over
    bytes) — deterministic and order-sensitive."""
    # FNV-1a 64 offset basis 0xcbf29ce484222325 (rounds 1-2 shipped a
    # digit-dropped 1469598103934665603 — caught by the INDEPENDENT golden
    # twin in tools/independent_twins.py, which re-derived the constant from
    # the published FNV spec instead of importing this module)
    h = 14695981039346656037
    for b in text.encode("utf-8"):
        h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


def md5_hex(text: str) -> str:
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def word_shingles(text: "str | None", k: int = 3) -> set[str]:
    """Distinct k-word shingles; NULL text has none (SQL parity: the
    Jaccard-family oracles' shingle CTE yields no rows for NULL docs)."""
    toks = tokens(text)
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _hash32(s: str) -> int:
    return zlib.crc32(s.encode("utf-8")) & 0xFFFFFFFF


def minhash_signature(shingles: set[str], num_hashes: int = 64, seed: int = 1) -> np.ndarray:
    """MinHash signature via affine reshuffles of one 32-bit base hash.

    h_i(x) = (a_i * crc32(x) + b_i) mod p — the classic construction; a_i/b_i
    are seeded deterministically.
    """
    if not shingles:
        return np.zeros(num_hashes, dtype=np.uint64)
    base = np.fromiter(
        (_hash32(s) for s in shingles), dtype=np.uint64, count=len(shingles)
    )
    a, b = _minhash_coeffs(num_hashes, seed)
    p = np.uint64(4294967311)  # prime > 2^32
    # (num_hashes, n_shingles) affine transform, min over shingles
    vals = (a[:, None] * base[None, :] + b[:, None]) % p
    return vals.min(axis=1)


_MINHASH_COEFFS: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def _minhash_coeffs(num_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Seeded affine coefficients, cached per (num_hashes, seed) — the
    RandomState construction cost dominates short documents otherwise."""
    key = (num_hashes, seed)
    got = _MINHASH_COEFFS.get(key)
    if got is None:
        rng = np.random.RandomState(seed)
        a = rng.randint(1, 2**31 - 1, size=num_hashes).astype(np.uint64)
        b = rng.randint(0, 2**31 - 1, size=num_hashes).astype(np.uint64)
        _MINHASH_COEFFS[key] = got = (a, b)
    return got


def jaccard(a: set[str], b: set[str]) -> float:
    """Set Jaccard with the 0/0 case pinned to 0.0: a zero-token document
    carries no similarity evidence, so two empty docs are NOT duplicates.
    This is the SQL oracles' semantics — their shingle CTE gives empty docs
    ``[array_to_string([], ' ')]`` = ``[NULL]``, and NULL never equals NULL,
    so the intersection is empty (found by the randomized differential,
    seed 0: the fixed testdata has no empty docs)."""
    if not a and not b:
        return 0.0
    inter = len(a & b)
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


def simhash64(text: str) -> int:
    """64-bit SimHash over token 64-bit hashes (unweighted)."""
    toks = tokens(text)
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for t in toks:
        h = int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
        bits = ((np.uint64(h) >> shifts) & np.uint64(1)).astype(np.int64)
        acc += bits * 2 - 1
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def doc_sample_bucket(doc_id: "int | str") -> int:
    """Deterministic 0-99 sample bucket from md5 of the stringified id —
    THE shared split primitive: ``doc_hash_sample`` and ``curated_corpus``
    must agree bit-for-bit on every document's fate, so both call this
    (oracle form: ``CAST(('0x' || substring(md5(id), 1, 8)) AS UBIGINT) % 100``).
    """

    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100


def doc_priority_key(doc_id: "int | str", weight: int) -> int:
    """Deterministic weighted-sampling priority: the first 15 hex digits of
    ``md5(str(doc_id))`` (60 bits, always a positive int64) integer-divided
    by the weight — the exact-integer analog of Efraimidis–Spirakis
    u^(1/w) priority sampling: a doc with twice the weight halves its key
    and doubles its selection odds, and because the arithmetic is pure
    int64 the Ray side and the SQL oracle agree bit-for-bit (no float pow
    or log round-trip). Oracle form:
    ``CAST(('0x' || substring(md5(CAST(id AS VARCHAR)), 1, 15)) AS BIGINT)
    // GREATEST(w, 1)``.
    """

    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) // max(
        int(weight), 1
    )
