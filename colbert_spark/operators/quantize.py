"""Embedding quantization — the vector-payload analog of the posting
codec (functions/codec.py) and the engine's mapping of the reference's
residual compression surface (colbert/indexing/codecs/residual.py:
ResidualCodec.compress/decompress quantizes 2-8-bit residuals around
centroids; this lexical engine keeps no centroid table, so the codec is
centroid-free symmetric max-abs int quantization).

Why it matters at 100 TB: a dim-1536 float32 embedding column is ~6 KB/
row; int8 symmetric quantization cuts every scan, shuffle, and cache of
that column 4× (float64 8×) at <0.5% cosine error on typical embedding
distributions — the difference between an ANN candidate join that fits
in executor memory and one that spills.

Everything is whole-stage-codegen array expressions (transform /
array_max) — no UDF, no Python. The quantized form is
(id, scale: double, q: array<int>) with

    q_j   = clamp(floor(x_j * L / scale + 0.5), -L, L),  L = 2^(bits-1)-1
    scale = max_j |x_j|           (all-zero vectors quantize to zeros)
    x̂_j  = q_j * scale / L

floor(x + 0.5) is used instead of round() deliberately: Spark round()
is HALF_UP while DuckDB round() is half-away-from-zero — floor-plus-half
is the one rounding rule both engines (and numpy) compute identically,
so the DuckDB oracle replays the codec bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _levels(bits: int) -> int:
    if not 2 <= bits <= 16:
        raise ValueError(f"bits {bits} outside [2, 16]")
    return (1 << (bits - 1)) - 1


def quantize_embeddings(items: DataFrame, bits: int = 8,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """(id, scale, q): per-vector symmetric max-abs quantization."""
    lev = _levels(bits)
    v = F.col(vec_col).cast("array<double>")
    scale = F.array_max(F.transform(v, lambda x: F.abs(x)))
    q = F.transform(
        v,
        lambda x: F.greatest(
            F.lit(-lev),
            F.least(F.lit(lev),
                    F.floor(x * F.lit(lev) / scale + F.lit(0.5)).cast("int")),
        ),
    )
    zeros = F.transform(v, lambda x: F.lit(0))
    return items.select(
        F.col(id_col),
        F.coalesce(scale, F.lit(0.0)).alias("scale"),
        F.when(scale == 0, zeros).otherwise(q).alias("q"),
    )


def dequantize_embeddings(qdf: DataFrame, bits: int = 8,
                          id_col: str = "vec_id",
                          q_col: str = "q",
                          scale_col: str = "scale",
                          out_col: str = "embedding") -> DataFrame:
    """Inverse transform: x̂ = q * scale / L (array<double>)."""
    lev = _levels(bits)
    return qdf.select(
        F.col(id_col),
        F.transform(
            F.col(q_col),
            lambda x: x.cast("double") * F.col(scale_col) / F.lit(lev),
        ).alias(out_col),
    )
