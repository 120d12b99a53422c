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

    def mask(self, missing_value=None, valid_min=None,
             valid_max=None) -> "MDArray":
        """GDALMDArray::GetMask (gcore/gdalmultidim.cpp GDALMDArrayMask):
        same-shape 0/1 array — 0 where value == missing_value /
        _FillValue, < valid_min, or > valid_max; 1 elsewhere."""
        cond = F.lit(True)
        if missing_value is not None:
            cond = cond & (F.col("value") != F.lit(float(missing_value)))
        if valid_min is not None:
            cond = cond & (F.col("value") >= F.lit(float(valid_min)))
        if valid_max is not None:
            cond = cond & (F.col("value") <= F.lit(float(valid_max)))
        return MDArray(
            self.df.select(*self.dims,
                           F.when(cond, F.lit(1.0)).otherwise(F.lit(0.0))
                           .alias("value")), self.dims)

    def apply_mask(self, mask: "MDArray") -> "MDArray":
        """Drop cells whose mask is 0 (the engine's absent-row nodata
        discipline) — one equi-join on the dimension columns."""
        if mask.dims != self.dims:
            raise ValueError(f"mask dims {mask.dims} != {self.dims}")
        m = mask.df.filter(F.col("value") == 1.0).select(
            *[F.col(d).alias(f"_m_{d}") for d in self.dims])
        on = [F.col(d) == F.col(f"_m_{d}") for d in self.dims]
        cond = on[0]
        for c in on[1:]:
            cond = cond & c
        return MDArray(
            self.df.join(m, cond, "left_semi").select(*self.dims, "value"),
            self.dims)

    def resampled(self, sizes: dict, alg: str = "nearest") -> "MDArray":
        """GDALMDArray::GetResampled (gcore/gdalmultidim.cpp;
        GDALMDArrayResampled warps the trailing X/Y dims) over named
        dims. `sizes`: {dim: (src_size, dst_size)}.

        - 'nearest' replays the RasterIO decimation rule the repo's
          raster.resize pins: src index = floor((dst+0.5)*ratio+1e-10).
          Both down- and upsampling distribute as an explode of each
          source row into its (possibly empty) destination index range,
          post-filtered by the authoritative floor check — pure Catalyst,
          exactly oracle-able (duckdb generate_series twin).
        - 'average' bins src indices by floor(i*dst/src) and averages —
          GDAL's overlap-weighted average coincides with this for
          integer downsample factors (the tested surface); non-integer
          ratios are rejected.
        """
        df = self.df
        if alg == "nearest":
            for dim, (src, dst) in sizes.items():
                if dim not in self.dims:
                    raise KeyError(f"unknown dimension {dim}")
                ratio = float(src) / float(dst)
                i = F.col(dim)
                j_lo = F.greatest(
                    F.lit(0), F.ceil(i / F.lit(ratio) - 1.5).cast("long"))
                j_hi = F.least(
                    F.lit(int(dst) - 1),
                    F.greatest(F.ceil((i + 1) / F.lit(ratio)).cast("long"),
                               j_lo))
                df = (df.withColumn("_j", F.explode(F.sequence(j_lo, j_hi)))
                      .filter(F.floor((F.col("_j") + F.lit(0.5))
                                      * F.lit(ratio) + F.lit(1e-10)) == i)
                      .drop(dim).withColumnRenamed("_j", dim))
            return MDArray(df.select(*self.dims, "value"), self.dims)
        if alg == "average":
            proj = []
            for d in self.dims:
                if d in sizes:
                    src, dst = sizes[d]
                    if src % dst != 0:
                        raise ValueError(
                            "average resample needs an integer factor "
                            f"({d}: {src}->{dst})")
                    proj.append(F.floor(F.col(d) / (src // dst))
                                .cast("long").alias(d))
                else:
                    proj.append(F.col(d))
            df = df.select(*proj, "value")
            return MDArray(
                df.groupBy(*self.dims).agg(F.avg("value").alias("value")),
                self.dims)
        raise ValueError(f"alg must be nearest/average: {alg}")

    def unscaled(self, scale: float = 1.0, offset: float = 0.0,
                 src_nodata: float | None = None) -> "MDArray":
        """GDALMDArray::GetUnscaled (gcore/gdalmultidim.cpp:6672):
        value*scale + offset promoted to double; scale==1 && offset==0
        returns self unchanged (the reference's short-circuit); source
        nodata cells become absent rows (this engine's nodata
        discipline, mirroring dstNodata=NaN)."""
        if scale == 1.0 and offset == 0.0 and src_nodata is None:
            return self
        df = self.df
        if src_nodata is not None:
            df = df.filter(F.col("value") != F.lit(float(src_nodata)))
        return MDArray(
            df.select(*self.dims,
                      (F.col("value").cast("double") * F.lit(float(scale))
                       + F.lit(float(offset))).alias("value")), self.dims)

    def combine(self, other: "MDArray", op: str = "add") -> "MDArray":
        """Element-wise array arithmetic between two same-dimension
        arrays (the multidim analog of VRT pixel functions /
        `gdal mdim convert` derived arrays; per-chunk loops in the
        reference become ONE equi-join on the dimension columns here).
        Cells missing from either operand are absent from the result
        (nodata propagates). op: add|sub|mul|div."""
        if other.dims != self.dims:
            raise ValueError(f"dims {other.dims} != {self.dims}")
        ops = {
            "add": lambda a, b: a + b,
            "sub": lambda a, b: a - b,
            "mul": lambda a, b: a * b,
            "div": lambda a, b: a / b,
        }
        if op not in ops:
            raise ValueError(f"op must be one of {sorted(ops)}: {op}")
        right = other.df.select(
            *[F.col(d).alias(f"_r_{d}") for d in other.dims],
            F.col("value").alias("_r_value"))
        cond = F.lit(True)
        for d in self.dims:
            cond = cond & (F.col(d) == F.col(f"_r_{d}"))
        joined = self.df.join(right, cond, "inner")
        return MDArray(
            joined.select(*self.dims,
                          ops[op](F.col("value"),
                                  F.col("_r_value")).alias("value")),
            self.dims)

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
