"""Streaming exact dedup over a SHARED MUTABLE INDEX — the one operator tier
the Dataset API genuinely can't express (SURVEY §7 tier (c): raw Ray actors
as a last resort, with the partitioning assumption documented).

``Dataset.groupby`` can dedup a *bounded* corpus, but a streaming ingest —
micro-batches arriving over time, every consumer needing to know what any
other consumer already admitted — needs an index that OUTLIVES a single
Dataset execution and is shared across tasks. That is a sharded actor set:

- ``MinClaimShard``: a plain ``@ray.remote`` actor holding ``hash -> min
  doc_id``. Registration is **commutative and idempotent** (min is a
  monotone merge, CRDT-style), so task/block arrival order CANNOT change the
  outcome — this is what makes the distributed result deterministic and
  lets the register pass run at full ``map_batches`` parallelism.
- Sharding: ``int(md5[:4]) % num_shards`` — uniform by construction, so no
  shard hot-spots regardless of key skew; each shard holds ~distinct/K
  entries (the memory bound to size K by).

Two passes (the honest streaming shape — a winner is only known once every
claim is in; single-pass systems emit-and-retract instead):

  1. register: every (hash, doc_id) claims into its shard;
  2. filter:   keep rows whose (hash, doc_id) IS the shard's winner.

Ingest is PARTITION-PARALLEL already: both passes run as ``map_batches``
over the Dataset's blocks, so every input partition feeds the shared index
concurrently from its own task — there is no driver-side feeder loop. The
min-claim's commutativity/idempotence is precisely what makes that safe
(arrival order across concurrent registering tasks cannot change winners).

``streaming_dedup_keep_first`` reproduces ``dedup_keep_first``'s exact
semantics (min doc_id per distinct text) through this machinery, so the same
DuckDB oracle pins it value-exact.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from html_parser_ray.pipelines.shuffle import read_table, sort_output


@ray.remote(num_cpus=0.25)
class MinClaimShard:
    """hash -> min(doc_id) index shard. ``num_cpus=0.25``: shards are mostly
    idle dict lookups; reserving whole CPUs would starve the map stages."""

    def __init__(self) -> None:
        self._best: dict[bytes, int] = {}

    def register(self, hashes: list[bytes], doc_ids: list[int]) -> int:
        best = self._best
        for h, d in zip(hashes, doc_ids):
            cur = best.get(h)
            if cur is None or d < cur:
                best[h] = d
        return len(best)

    def winners(self, hashes: list[bytes], doc_ids: list[int]) -> list[bool]:
        best = self._best
        return [best.get(h) == d for h, d in zip(hashes, doc_ids)]

    def size(self) -> int:
        return len(self._best)

    def snapshot(self) -> "list[tuple[bytes, int]]":
        """Full index state for a checkpoint. Min-claims are idempotent and
        commutative, so a snapshot taken at ANY moment is safe: replaying
        micro-batches that registered after it cannot change winners."""
        return list(self._best.items())

    def restore(self, items: "list[tuple[bytes, int]]") -> None:
        best = self._best
        for h, d in items:  # min-merge, so restore composes with new claims
            cur = best.get(h)
            if cur is None or d < cur:
                best[h] = d


def _shard_calls(hashes: list[bytes], doc_ids: np.ndarray, num_shards: int):
    """Group (hash, doc_id) pairs by shard; returns
    ``{shard: (hashes, ids, positions)}`` — positions carried along so
    callers never re-derive the grouping (one pass, no implicit
    iteration-order coupling between two structures)."""
    by: dict[int, tuple[list[bytes], list[int], list[int]]] = {}
    for i, (h, d) in enumerate(zip(hashes, doc_ids)):
        s = int.from_bytes(h[:4], "big") % num_shards
        slot = by.get(s)
        if slot is None:
            slot = ([], [], [])
            by[s] = slot
        slot[0].append(h)
        slot[1].append(int(d))
        slot[2].append(i)
    return by


class StreamingDeduper:
    """Facade owning the shard actors; usable from any number of concurrent
    Dataset tasks or ad-hoc micro-batch producers."""

    def __init__(self, num_shards: int = 8):
        self.num_shards = num_shards
        self.shards = [MinClaimShard.remote() for _ in range(num_shards)]

    def register_batch(self, hashes: list[bytes], doc_ids) -> None:
        by = _shard_calls(hashes, np.asarray(doc_ids), self.num_shards)
        ray.get(
            [self.shards[s].register.remote(h, d) for s, (h, d, _) in by.items()]
        )

    def winner_mask(self, hashes: list[bytes], doc_ids) -> np.ndarray:
        by = _shard_calls(hashes, np.asarray(doc_ids), self.num_shards)
        mask = np.zeros(len(hashes), dtype=bool)
        # ONE iteration collects (positions, rpc) pairs together — two
        # parallel iterations of the dict would couple on implicit order,
        # the exact hazard _shard_calls carries positions to avoid
        calls = [
            (pos, self.shards[s].winners.remote(h, d))
            for s, (h, d, pos) in by.items()
        ]
        results = ray.get([ref for _, ref in calls])
        for (pos, _), win in zip(calls, results):
            mask[np.asarray(pos)] = win
        return mask

    def index_size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def snapshot(self) -> "list[list[tuple[bytes, int]]]":
        """Per-shard index checkpoint — unlike the window operator no
        quiescence is needed at all (min-claim is a CRDT: any interleaving
        of restore and replayed registers converges to the same winners)."""
        return ray.get([s.snapshot.remote() for s in self.shards])

    def restore(self, snap: "list[list[tuple[bytes, int]]]") -> None:
        assert len(snap) == self.num_shards, "shard count mismatch"
        ray.get(
            [s.restore.remote(items) for s, items in zip(self.shards, snap)]
        )

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []


# NULL texts form ONE dedup group (DuckDB: GROUP BY md5(text) collects all
# NULLs together). Keys are length-framed so the sentinel can never equal a
# real text's key: real = b"\x01" + 16-byte digest (17 bytes), NULL = one
# byte — the min-claim index and the 4-byte shard prefix both key on the
# full bytes object, and the sentinel deterministically lands on shard 0.
_NULL_TEXT_KEY = b"\x00"


def _hashes(texts: "list[str | None]") -> list[bytes]:
    return [
        b"\x01" + hashlib.md5(t.encode()).digest() if t is not None
        else _NULL_TEXT_KEY
        for t in texts
    ]


def streaming_dedup_keep_first(
    sf_dir: str, num_shards: int = 8
) -> "ray.data.Dataset | pd.DataFrame":
    """``dedup_keep_first`` semantics (min doc_id per distinct text) through
    the shared-index actor tier: register pass at full map parallelism
    (commutative min-claims — block order free), then a filter pass keeping
    the winners. Same DuckDB oracle as the groupby form."""
    from html_parser_ray.state.fleet import fit_counts

    # fit the 0.25-CPU shard fleet to the cluster, reserving a full CPU for
    # the Dataset map tasks that feed it (8 shards = 2.0 CPUs starves the
    # register pass on a 2-CPU session); winner-per-hash is shard-count
    # invariant (hash-modulo sharding, min-claim merge)
    (num_shards,) = fit_counts([num_shards], frac=0.25, reserve=1.0)
    dd = StreamingDeduper(num_shards)
    try:
        ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

        def register(df: pd.DataFrame) -> pd.DataFrame:
            dd.register_batch(
                _hashes(list(df["text"])), df["doc_id"].to_numpy()
            )
            return pd.DataFrame({"n": [len(df)]})

        # consume the register pass fully before filtering (the barrier IS
        # the semantics: winners exist only after every claim)
        ds.map_batches(register, batch_format="pandas").count()

        def keep_winners(df: pd.DataFrame) -> pd.DataFrame:
            mask = dd.winner_mask(
                _hashes(list(df["text"])), df["doc_id"].to_numpy()
            )
            return pd.DataFrame({"doc_id": df["doc_id"].to_numpy()[mask]})

        out = ds.map_batches(keep_winners, batch_format="pandas")
        return sort_output(
            out, ["doc_id"], pa.schema([("doc_id", pa.int64())])
        )
    finally:
        dd.shutdown()
