"""Cluster-adaptive sizing for fractional-CPU actor fleets.

A fleet whose summed CPU demand reaches the cluster total deadlocks the
run: the state actors (0.25 CPU each) fill every scheduling slot and the
producers (feeder actors, Dataset tasks) can never start, so the driver's
``ray.get`` blocks forever. Found by the randomized differential's
``--num-cpus 2`` sweep: 8 hopping-window shards (2.0 CPUs) + 4 feeders
(1.0 CPU) on a 2-CPU session hung until killed. The committed defaults are
sized for the 32-CPU sandbox; on a real cluster the same arithmetic holds
against whatever ``ray.cluster_resources()`` reports, so fleet sizes must
derive from it rather than from constants alone.
"""

from __future__ import annotations


def fit_counts(
    counts: "list[int]",
    frac: float = 0.25,
    reserve: float = 0.5,
    cpus: "float | None" = None,
) -> "list[int]":
    """Shrink actor-group ``counts`` (each actor costing ``frac`` CPUs)
    until the fleet fits in the cluster with ``reserve`` CPUs left for
    producers. Shrinks the largest group first (ties: the earliest), never
    below 1 per group; returns counts unchanged when the cluster size is
    unknown (not yet initialised) or already sufficient.

    Correctness is count-invariant by design everywhere this is used:
    shard membership is hash-modulo with commutative merges, and feeder
    partitioning is MIN-combined watermarks — so scaling the fleet down
    changes scheduling, not results (pinned by the multi-feeder vs batch
    oracle tests).
    """
    import os

    counts = list(counts)
    if cpus is None:
        try:
            import ray

            if ray.is_initialized():
                cpus = float(ray.cluster_resources().get("CPU", 0.0))
            else:
                # Ray not up yet: the caller's first actor creation will
                # AUTO-init a local cluster advertising the host's CPUs, so
                # size against that (the library must not call ray.init —
                # the driver owns the session). Returning the counts
                # unchanged here (the pre-r5 behavior) re-created the
                # documented 2-CPU deadlock on exactly the auto-init path.
                cpus = float(os.cpu_count() or 0)
        except Exception:
            cpus = 0.0
    if cpus <= 0:
        return counts
    slots = max(len(counts), int((cpus - reserve) / frac))
    while sum(counts) > slots:
        i = max(range(len(counts)), key=lambda j: counts[j])
        if counts[i] <= 1:
            break
        counts[i] -= 1
    return counts
