"""Engine configuration.

The reference exposes exactly one config knob
(``DefaultUTF16WithBOMByteOrder``, id3v2frames.go:18) as a package-level
var; the engine generalizes that into one explicit config object passed
into stages/actors so every tolerance is visible and test-settable.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    # --- per-row invariant tolerances (BASELINE.json input_hint) ---
    psnr_min_db: float = 40.0          # lossy decode invariant threshold
    phash_max_hamming: int = 2         # declared-phash vs recomputed-phash tolerance
    near_dup_max_hamming: int = 2      # phash near-duplicate clustering radius

    # --- declared-size / allocation guards (util.go:44-54 analogue) ---
    max_decode_bytes: int = 64 * 1024 * 1024   # refuse to decode cells larger than this
    max_pixels: int = 64 * 1024 * 1024         # refuse w*h beyond this before allocating

    # --- charset decode (M10): BOM-less utf-16 default byte order ---
    # (the reference's DefaultUTF16WithBOMByteOrder package knob,
    # id3v2frames.go:18 — T5 config surface)
    utf16_default_order: str = "le"

    # --- declared-dims sanity range (range check) ---
    min_dim: int = 1
    max_dim: int = 1 << 20

    # --- batch/stage sizing (image payloads are KB..MB scale → small batches) ---
    # 1024 keeps the task count low enough that driver dispatch never
    # bottlenecks a 32-CPU node (measured: 256-row batches = 3.1k tasks
    # for an 800k sweep ≈ 205 dispatches/s, ~30% of sweep wall; 1024 is
    # ~flat at 8 CPUs and ~25% faster at 32). MB-scale production rows
    # should shrink this so batch × concurrency fits the worker heap.
    validate_batch_size: int = 1024
    # None → autoscale the actor pool to the cluster's CPU count at
    # pipeline-construction time (scale_concurrency below); a fixed cap
    # here would silently serialize the decode stage on bigger clusters.
    validate_concurrency: int | tuple[int, int] | None = None
    # memory sizing for the decode actors: batch_size × peak decoded
    # pixels must fit each actor's heap share. Sandbox images are KB-
    # scale → 1 CPU/actor; production MB-scale rows should raise
    # num_cpus (fewer, fatter actors) or shrink validate_batch_size.
    validate_actor_num_cpus: float = 1.0
    validate_actor_memory: int | None = None  # bytes; Ray memory resource hint
    stats_batch_size: int = 4096
    stats_concurrency: int | tuple[int, int] | None = None

    # --- shuffle / skew ---
    dedup_num_partitions: int = 16
    salt_buckets: int = 8              # salting factor for skewed caption keys

    # --- sketches ---
    hll_precision: int = 12            # 2^12 registers ≈ 1.6% rel. error
    tdigest_max_centroids: int = 128

    # --- drift ---
    psi_threshold: float = 0.2         # industry-standard "significant shift"
    drift_bins: int = 10

    # --- fixture generation (deterministic; FIXTURES.md) ---
    seed: int = 42
    formats: tuple[str, ...] = ("png", "ppm", "bmp", "dctq")

    # caption golden source: reference-id table carries caption_md5
    extras: dict = field(default_factory=dict, compare=False)


DEFAULT_CONFIG = EngineConfig()


def scale_concurrency(configured: int | tuple[int, int] | None,
                      reserve: int = 1,
                      fixed_frac: float | None = None) -> int | tuple[int, int]:
    """Resolve a stage's actor-pool ``concurrency`` against the cluster.

    ``None`` → autoscaling pool (1, cluster_CPUs - reserve): the pool
    can grow to saturate whatever cluster the job landed on while the
    streaming executor keeps ``reserve`` CPUs for the read/shuffle
    stages. ``fixed_frac`` instead returns a FIXED pool of that fraction
    of cluster CPUs — measured 2.4× faster than the autoscaler for a
    long compute-bound stage (the ramp churns actors and never settles),
    while leaving the remaining CPUs to the read + reduce stages.
    Explicit ``configured`` values pass through untouched (test
    determinism)."""
    if configured is not None:
        return configured
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    if fixed_frac is not None:
        return max(1, int(cpus * fixed_frac))
    return (1, max(cpus - reserve, 1))


def join_num_partitions(factor: float = 0.5, floor: int = 8) -> int:
    """Partition count for ``Dataset.join`` / hash-exchange operators.

    ~CPUs/2, same rationale as ``keycol_num_blocks``: join task count
    must scale with the cluster, not sit at a hardcoded 8 — on a
    256-node cluster 8 partitions would serialize the exchange, while
    thousands on a laptop would be pure orchestration overhead."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(floor, int(cpus * factor))
