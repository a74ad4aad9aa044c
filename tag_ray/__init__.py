"""tag_ray — a Ray-Data-native schema + constraint validation engine.

Plays, at 10^12-row image+caption-table scale, the role the reference
(dhowden/tag, /root/reference) plays for single audio files: per-record
format sniffing (tag.go:30-66), header/invariant verification
(id3v2.go:234-400, sum.go:14-44) and collection-scale pass/fail sweeps
(cmd/check/main.go:39-194) — recast as vectorized constraint checks over
zero-copy Arrow batches scheduled by Ray Data's streaming executor.

Nothing here is a port: the reference is a serial Go byte-stream parser;
this engine expresses every stage as a ``ray.data.Dataset`` transform
(``map_batches`` over Arrow, actor pools for stateful stages, explicit
groupby shuffles for cross-row checks).
"""

from tag_ray.config import EngineConfig

__all__ = ["EngineConfig"]
__version__ = "0.1.0"
