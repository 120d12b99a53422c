"""Multidimensional arrays (GDALMDArray) as long-format dimension tables.

Reference: the multidim data model (/root/reference/gcore/gdalmultidim.cpp,
GDALMDArray::Read/GetView; CLI surface apps/gdalalg_mdim_info.cpp /
gdalalg_mdim_convert.cpp). There an N-D array is a chunked in-memory
buffer with named dimensions and a `[start:stop:step]` view syntax; here
it is a LONG-FORMAT DataFrame — one column per dimension (int64 index)
plus `value` — wrapped with the dimension spec. Every view/statistic is
pure Catalyst (filters and groupBys over dim columns), so Parquet
min/max pruning on dim columns plays the role of the reference's chunk
index: a subset over a leading dimension prunes row groups the same way
a hyperslab read seeks chunks.

Ops (mirroring `gdal mdim info/convert` + MDArray methods):
- subset: per-dimension [start:stop:step] views (GetView slicing); step
  REBASES indices ((i - start) / step) exactly like a strided view;
- transpose: dimension reorder (GDALMDArray::Transpose) — a metadata
  rename in long format;
- reduce: min/max/mean/sum/count over named dims (GetResampled/statistics
  shapes) -> a lower-rank MDArray;
- to_classic: a 2-D view becomes the (bx, by, value) grid the raster
  operators consume (GDALMDArray::AsClassicDataset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_REDUCERS = {"mean": F.avg, "min": F.min, "max": F.max, "sum": F.sum,
             "count": F.count}


class MDArray:
    """A named-dimension wrapper over a long-format (dims..., value)
    DataFrame. `dims` is an ordered list of dimension column names."""

    def __init__(self, df: DataFrame, dims: list):
        self.df = df
        self.dims = list(dims)

    @classmethod
    def from_long(cls, df: DataFrame, dims: list,
                  value_col: str = "value") -> "MDArray":
        cols = [F.col(d).cast("long").alias(d) for d in dims]
        return cls(df.select(*cols, F.col(value_col).alias("value")), dims)

    def subset(self, **slices) -> "MDArray":
        """Per-dimension (start, stop, step) views; stop exclusive, step
        rebases the index: dim' = (dim - start) / step (GetView
        semantics). Accepts (start, stop) or (start, stop, step)."""
        df = self.df
        for dim, sl in slices.items():
            if dim not in self.dims:
                raise KeyError(f"unknown dimension {dim}")
            start, stop, *rest = sl
            step = rest[0] if rest else 1
            df = df.filter((F.col(dim) >= start) & (F.col(dim) < stop))
            if step != 1:
                df = df.filter((F.col(dim) - start) % step == 0)
            df = df.withColumn(dim, ((F.col(dim) - start) / step).cast("long"))
        return MDArray(df, self.dims)

    def transpose(self, order: list) -> "MDArray":
        if sorted(order) != sorted(self.dims):
            raise ValueError(f"order {order} must permute {self.dims}")
        return MDArray(self.df.select(*order, "value"), list(order))

    def reduce(self, over, how: str = "mean") -> "MDArray":
        """Aggregate out the `over` dims, keeping the rest."""
        over = [over] if isinstance(over, str) else list(over)
        keep = [d for d in self.dims if d not in over]
        agg = _REDUCERS[how]("value").alias("value")
        return MDArray(self.df.groupBy(*keep).agg(agg), keep)

    def info(self) -> dict:
        """Dimension sizes + basic stats (gdal mdim info shape)."""
        aggs = [F.countDistinct(d).alias(f"n_{d}") for d in self.dims]
        aggs += [F.count("value").alias("n_values"),
                 F.min("value").alias("min"), F.max("value").alias("max")]
        return self.df.agg(*aggs).collect()[0].asDict()

    def to_classic(self, x_dim: str, y_dim: str) -> DataFrame:
        """2-D view -> the (bx, by, value) grid raster operators consume
        (AsClassicDataset)."""
        if set(self.dims) != {x_dim, y_dim}:
            raise ValueError("to_classic needs exactly the two named dims "
                             f"(have {self.dims})")
        return self.df.select(F.col(x_dim).alias("bx"),
                              F.col(y_dim).alias("by"), "value")
