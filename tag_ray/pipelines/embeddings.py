"""Similarity search + embedding stats over the embeddings table.

Brute-force cosine against a broadcast query matrix is the baseline
(numpy matmul per batch); the LSH-bucketed variant in dedup.py is the
scale path. Norm/cosine arithmetic is per-row float64 (bit-identical
across engines); only the tiny per-row reductions differ in order, so
4-decimal rounding gives exact oracle parity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Count, Mean

from tag_ray.sources import table


def _emb_matrix(b: pa.Table) -> np.ndarray:
    """(rows, dim) float64 from the list<float> column — zero-copy flatten."""
    col = b["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1)


def emb_norms(sf_dir: str) -> rd.Dataset:
    emb = table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def derive(b: pa.Table) -> pa.Table:
        m = _emb_matrix(b)
        return pa.Table.from_pydict({
            "vec_id": b["vec_id"],
            "norm": pa.array(np.round(np.sqrt((m * m).sum(axis=1)), 4)),
        })

    return emb.map_batches(derive, batch_format="pyarrow")


NORMS_SQL = """
SELECT vec_id,
       ROUND(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS norm
FROM embeddings
"""


def emb_label_stats(sf_dir: str) -> rd.Dataset:
    emb = table(sf_dir, "embeddings", columns=["label", "embedding"])

    def derive(b: pa.Table) -> pa.Table:
        m = _emb_matrix(b)
        return pa.Table.from_pydict({
            "label": b["label"],
            "norm": pa.array(np.sqrt((m * m).sum(axis=1))),
        })

    agg = (emb.map_batches(derive, batch_format="pyarrow")
           .groupby("label")
           .aggregate(Count(alias_name="n"), Mean("norm", alias_name="avg_norm_raw")))

    def finalize(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "label": b["label"], "n": b["n"],
            "avg_norm": pa.array(np.round(
                b["avg_norm_raw"].to_numpy(zero_copy_only=False), 4)),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


LABEL_STATS_SQL = """
SELECT label, COUNT(*) AS n,
       ROUND(AVG(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS avg_norm
FROM embeddings GROUP BY label
"""


def emb_cosine_topk(sf_dir: str, query_vec_id: int = 0, k: int = 10) -> pd.DataFrame:
    """Brute-force cosine top-k vs one query vector: broadcast the query,
    matmul per batch, local top-k per batch, exact global top-k on the
    small union. Ties broken on (cos_r DESC, vec_id ASC) after rounding —
    deterministic across engines."""
    import pyarrow.parquet as pq
    from tag_ray.sources import table_path
    qtbl = pq.read_table(table_path(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    qi = qtbl["vec_id"].to_pylist().index(query_vec_id)
    q = np.array(qtbl["embedding"][qi].as_py(), dtype=np.float64)
    q /= np.sqrt((q * q).sum())
    handle = ray.put(q)

    emb = table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    class TopK:
        def __init__(self, h, k, exclude):
            self.q = ray.get(h)
            self.k = k
            self.exclude = exclude

        def __call__(self, b: pa.Table) -> pa.Table:
            m = _emb_matrix(b)
            norms = np.sqrt((m * m).sum(axis=1))
            cos = (m @ self.q) / np.where(norms == 0, 1.0, norms)
            cos_r = np.round(cos, 4)
            ids = b["vec_id"].to_numpy(zero_copy_only=False)
            keep = ids != self.exclude
            order = np.lexsort((ids[keep], -cos_r[keep]))[: self.k]
            return pa.Table.from_pydict({
                "vec_id": pa.array(ids[keep][order]),
                "cos": pa.array(cos_r[keep][order]),
            })

    partials = emb.map_batches(
        TopK, fn_constructor_kwargs={"h": handle, "k": k, "exclude": query_vec_id},
        batch_format="pyarrow", concurrency=(1, 4))
    df = partials.to_pandas()
    df = df.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
    return df.reset_index(drop=True)


def cosine_topk_sql(query_vec_id: int = 0, k: int = 10) -> str:
    return f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {query_vec_id})
SELECT vec_id,
       ROUND(list_sum(list_transform(list_zip(embedding, (SELECT qe FROM q)),
                                     p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt((SELECT list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) FROM q))),
             4) AS cos
FROM embeddings WHERE vec_id != {query_vec_id}
ORDER BY cos DESC, vec_id LIMIT {k}
"""
