"""§2.9 extension surface: user-registered checks flow end-to-end
through validate() without editing the built-in suite — the engine's
analogue of the reference's data-driven frame-legality tables
(validID3Frame, /root/reference/id3v2frames.go:289-296) and of the mbz
package extending purely via public surface (mbz/mbz.go:108-114)."""

import numpy as np
import pyarrow as pa

from tag_ray.checks.registry import (CheckRegistry, ColumnConstraint,
                                     RowCheck, register_check,
                                     unregister_check)


def test_column_constraint_kernel():
    reg = CheckRegistry()
    reg.register(ColumnConstraint("w", not_null=True, min_value=1,
                                  max_value=100))
    batch = pa.Table.from_pydict({
        "image_id": ["a", "b", "c", "d"],
        "partition_id": pa.array([0, 0, 1, 1], pa.int32()),
        "w": pa.array([50, None, 0, 200], pa.int32()),
    })
    out = reg.run(batch)
    assert out.num_rows == 3
    assert set(out["image_id"].to_pylist()) == {"b", "c", "d"}
    assert set(out["check"].to_pylist()) == {"constraint_w"}


def test_set_membership_and_kernel_containment():
    reg = CheckRegistry()
    reg.register(ColumnConstraint("fmt", allowed=("png", "bmp")))

    def boom(batch):
        raise RuntimeError("kernel bug")

    reg.register(RowCheck("exploding", ("fmt",), boom))
    batch = pa.Table.from_pydict({
        "image_id": ["a", "b"],
        "partition_id": pa.array([0, 0], pa.int32()),
        "fmt": ["png", "gif"],
    })
    out = reg.run(batch)
    checks = out["check"].to_pylist()
    # membership violation for 'gif' + ONE contained error row for the
    # buggy kernel (never a task failure)
    assert checks.count("constraint_fmt") == 1
    assert checks.count("exploding") == 1
    assert "kernel bug" in out["detail"].to_pylist()[-1]


def test_registered_check_through_validate(ray_session, smoke_corpus):
    """A custom check registered in the DEFAULT registry must surface in
    the full validate() sweep's violation rows."""
    from tag_ray.pipelines import validate as V

    def odd_width(batch: pa.Table):
        w = batch["w"].to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(invalid="ignore"):
            mask = np.nan_to_num(w % 2, nan=0.0) == 1.0
        return mask, "width is odd"

    register_check(RowCheck("odd_width", ("w",), odd_width))
    try:
        v = V.validate(smoke_corpus + "/images",
                       smoke_corpus + "/ref_ids.parquet").to_pandas()
    finally:
        unregister_check("odd_width")
    odd = v[v["check"] == "odd_width"]
    assert len(odd) > 0
    assert (odd["detail"] == "width is odd").all()
    # built-in suite unaffected
    assert (v["check"] == "fmt_magic").any() or (v["check"] != "odd_width").any()

    # a second sweep after unregistering must NOT carry the check
    v2 = V.validate(smoke_corpus + "/images",
                    smoke_corpus + "/ref_ids.parquet").to_pandas()
    assert not (v2["check"] == "odd_width").any()
