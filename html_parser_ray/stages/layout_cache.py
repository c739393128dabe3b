"""Sharded layout-decode cache: decode each distinct media_ref ONCE
cluster-wide instead of once per extract actor.

Why this exists (measured, BENCH/BASELINE.md §11): on the bench corpus the
media spans repeat heavily (244k spans over 68.7k distinct refs, 3.55x) but
a ref's repeats SCATTER across the extract pool, so the per-actor memo
barely helps — expected distinct (actor, ref) pairs are ~227k of 244k, a
~7% saving — while the real PDF layout decode is ~75% of the cold
full-pipeline extract CPU. Routing memo misses to K ref-hash shard actors
makes cluster-wide decodes exactly equal distinct refs (3.3x fewer) for the
price of one batched RPC per extract batch (~10 KB of ref strings out,
~50 KB of JSON back — microseconds against the ~15 ms of decode it
replaces).

This is the "shared mutable index" case the Dataset API genuinely cannot
express, hence raw Ray actors (the only ones in the extraction path).
Scale notes for the 256-node / 10^12-doc target:

- K should grow with the cluster — one shard per ~8-16 extract slots keeps
  per-shard RPC fan-in bounded; shard choice is a deterministic content
  hash (crc32) so every actor on every node routes a ref identically.
- The shard dict is size-capped. Bounded ref universes (the common case:
  a media CAS keyed by content hash has far fewer distinct blobs than doc
  references to them) fit; an UNBOUNDED ref space drives the hit rate to
  zero, at which point pass ``shared_layout_cache=0`` and the extract
  actors decode locally exactly as before — the cache is an optimization,
  never a semantic dependency.
- Because a shard actor executes requests serially, two extract actors
  racing on the same cold ref still produce ONE decode (the second request
  hits the dict) — total decodes == distinct refs, which also makes total
  work independent of the extract pool size (the same parallelism-fairness
  property the scaling bench otherwise needs ``layout_memo=False`` for).

Failure mode: any RPC error (dead shard, shutdown race) permanently flips
the calling extract actor back to local decode for the rest of its life —
output is identical either way (the JSON is a pure function of the ref),
only the dedup saving is lost.
"""

from __future__ import annotations

import json
import zlib

import ray


@ray.remote(num_cpus=0.25)
class LayoutCacheShard:
    """One shard of the distinct-ref decode cache.

    ``num_cpus=0.25``: a shard is idle dict lookups after warmup; decodes
    happen once per distinct ref. Four shards cost one CPU of reservation,
    leaving the extract pool's sizing untouched.
    """

    def __init__(
        self,
        model_name: str = "layout-stub-v0",
        pdf_decode: bool = True,
        cap: int = 1 << 20,
    ) -> None:
        from html_parser_ray.extract.layout import LayoutParser

        # memo=False: this dict IS the memo (caching the serialized JSON
        # avoids re-serializing on every hit, which the parser's own
        # dict-returning lru could not)
        self._parser = LayoutParser(model_name, pdf_decode=pdf_decode, memo=False)
        self._cache: dict[str, bytes] = {}
        self._cap = cap
        self._decodes = 0
        self._hits = 0

    def get_many(self, refs: "list[str]") -> "list[bytes]":
        """Serialized layout JSON for each ref (decoding misses once)."""
        cache = self._cache
        out = []
        for r in refs:
            v = cache.get(r)
            if v is None:
                v = json.dumps(self._parser.parse(r), sort_keys=True).encode(
                    "utf-8"
                )
                self._decodes += 1
                if len(cache) < self._cap:
                    cache[r] = v
            else:
                self._hits += 1
            out.append(v)
        return out

    def stats(self) -> dict:
        return {
            "decodes": self._decodes,
            "hits": self._hits,
            "size": len(self._cache),
        }


def shard_of(ref: str, num_shards: int) -> int:
    """Deterministic content-hash shard routing (crc32, NOT Python's
    per-process-randomized ``hash``: every actor must agree)."""
    return zlib.crc32(ref.encode("utf-8")) % num_shards


def create_layout_cache(
    num_shards: int,
    model_name: str = "layout-stub-v0",
    pdf_decode: bool = True,
) -> "list[ray.actor.ActorHandle]":
    """Spawn the shard actors. Handles are serializable — pass them to
    ``ExtractSpansBatch`` via ``fn_constructor_kwargs`` and the plan keeps
    them alive for its lifetime."""
    return [
        LayoutCacheShard.remote(model_name=model_name, pdf_decode=pdf_decode)
        for _ in range(num_shards)
    ]


def fetch_media_jsons(
    shards: "list[ray.actor.ActorHandle]", refs: "list[str]"
) -> "list[bytes]":
    """One batched RPC round to the owning shards for ``refs`` (grouped by
    shard, all shards queried concurrently). Raises on any shard failure —
    the caller owns the local-decode fallback."""
    k = len(shards)
    by_shard: "list[list[str]]" = [[] for _ in range(k)]
    by_shard_pos: "list[list[int]]" = [[] for _ in range(k)]
    for i, r in enumerate(refs):
        s = shard_of(r, k)
        by_shard[s].append(r)
        by_shard_pos[s].append(i)
    futures = [
        shards[s].get_many.remote(by_shard[s]) for s in range(k) if by_shard[s]
    ]
    live = [s for s in range(k) if by_shard[s]]
    out: "list[bytes]" = [b""] * len(refs)
    for s, jsons in zip(live, ray.get(futures)):
        for pos, j in zip(by_shard_pos[s], jsons):
            out[pos] = j
    return out
