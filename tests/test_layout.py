"""Z-order file layout: written files must carry disjoint, spatially
tight z-key ranges so bbox scans can file-skip."""

import shutil
import tempfile

import pyspark.sql.functions as F

from tree_code_chunker_spark.operators.geo import cell_col, derive_point_cols
from tree_code_chunker_spark.operators.tiles import layout_by_cell


def _points(spark, n=20_000):
    base = spark.range(n).select(
        (F.col("id") % 500).alias("doc_id"),
        (F.col("id") / 500).cast("long").alias("span_pos"))
    qlat, qlon = derive_point_cols(F.col("doc_id"), F.col("span_pos"))
    return base.select("doc_id", "span_pos",
                       qlat.alias("qlat"), qlon.alias("qlon"))


def _file_ranges(spark, path):
    """(file, min_zkey, max_zkey, rows) for every parquet file written."""
    return (
        spark.read.parquet(path)
        .withColumn("f", F.input_file_name())
        .withColumn("z", cell_col(F.col("qlat"), F.col("qlon")))
        .groupBy("f")
        .agg(F.min("z").alias("lo"), F.max("z").alias("hi"),
             F.count("*").alias("rows"))
        .collect()
    )


def test_layout_files_have_disjoint_z_ranges(spark):
    n_files = 8
    out = tempfile.mkdtemp(prefix="zorder_")
    try:
        layout_by_cell(_points(spark), n_files).write.mode(
            "overwrite").parquet(out)
        ranges = sorted(_file_ranges(spark, out), key=lambda r: r.lo)
        assert sum(r.rows for r in ranges) == 20_000
        assert 2 <= len(ranges) <= n_files
        for prev, cur in zip(ranges, ranges[1:]):
            assert prev.hi < cur.lo          # strictly disjoint intervals
        # balanced despite spatial skew: no file holds >60% of the rows
        assert max(r.rows for r in ranges) <= 12_000
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_layout_bbox_scan_skips_most_files(spark):
    out = tempfile.mkdtemp(prefix="zorder_")
    try:
        layout_by_cell(_points(spark), 16).write.mode(
            "overwrite").parquet(out)
        ranges = _file_ranges(spark, out)
        # a z-contiguous probe the size of one file's span must intersect
        # only a small prefix of the 16 files' stat ranges
        lo = sorted(r.lo for r in ranges)[4]
        probe_lo, probe_hi = lo, lo + 1_000_000
        hit = [r for r in ranges if r.lo <= probe_hi and r.hi >= probe_lo]
        assert len(hit) <= 4
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_layout_keep_key_and_extra_sort(spark):
    pts = _points(spark, 5_000).withColumn(
        "t", (F.col("doc_id") * 7 + F.col("span_pos")) % 100)
    df = layout_by_cell(pts, 4, extra_sort=("t",), keep_key=True)
    assert "zkey" in df.columns
    # within every partition rows are (zkey, t)-sorted
    import pandas as pd

    def check(it):
        for pdf in it:
            ok = (pdf[["zkey", "t"]].values.tolist()
                  == sorted(pdf[["zkey", "t"]].values.tolist()))
            yield pd.DataFrame({"ok": [bool(ok)]})

    flags = df.mapInPandas(check, "ok boolean").collect()
    assert flags and all(r.ok for r in flags)


def test_layout_rejects_bad_n_files(spark):
    import pytest
    with pytest.raises(ValueError, match="n_files"):
        layout_by_cell(_points(spark, 10), 0)


def test_layout_rejects_existing_zkey_column(spark):
    import pytest
    pts = _points(spark, 10).withColumn("zkey", F.lit(7))
    with pytest.raises(ValueError, match="zkey"):
        layout_by_cell(pts, 2)


def test_layout_bbox_scan_file_skip_via_parquet_stats(spark):
    """VERDICT r5 item 3: the file-skip effect measured end-to-end from the
    written files' OWN parquet row-group statistics — a bbox scan over the
    z-laid-out table can skip most files; the same rows written in arrival
    order can skip none."""
    import glob

    import pyarrow.parquet as pq

    BBOX = (20000, 26000, 38000, 46000)  # y0, y1, x0, x1 (half-open)

    def skippable(path):
        skip = total = 0
        for f in glob.glob(f"{path}/*.parquet"):
            total += 1
            md = pq.ParquetFile(f).metadata
            names = {md.schema.column(i).name: i
                     for i in range(md.num_columns)}
            lo = {c: min(md.row_group(g).column(names[c]).statistics.min
                         for g in range(md.num_row_groups))
                  for c in ("qlat", "qlon")}
            hi = {c: max(md.row_group(g).column(names[c]).statistics.max
                         for g in range(md.num_row_groups))
                  for c in ("qlat", "qlon")}
            if (hi["qlat"] < BBOX[0] or lo["qlat"] >= BBOX[1]
                    or hi["qlon"] < BBOX[2] or lo["qlon"] >= BBOX[3]):
                skip += 1
        return skip, total

    pts = _points(spark)
    lay = tempfile.mkdtemp(prefix="zskip_")
    unlay = tempfile.mkdtemp(prefix="unskip_")
    try:
        layout_by_cell(pts, 16).write.mode("overwrite").parquet(lay)
        pts.repartition(16, "doc_id").write.mode("overwrite").parquet(unlay)
        lay_skip, lay_total = skippable(lay)
        unlay_skip, unlay_total = skippable(unlay)
        # the laid-out table skips MOST files; the hash layout skips none
        # (every file covers the whole grid)
        assert lay_total >= 8 and lay_skip >= lay_total // 2, (
            lay_skip, lay_total)
        assert unlay_skip == 0, (unlay_skip, unlay_total)
        # and the pruned scan is still exact: same rows from both layouts
        def bbox_rows(path):
            t = spark.read.parquet(path)
            return sorted(map(tuple, t.filter(
                (F.col("qlat") >= BBOX[0]) & (F.col("qlat") < BBOX[1])
                & (F.col("qlon") >= BBOX[2]) & (F.col("qlon") < BBOX[3])
            ).collect()))

        assert bbox_rows(lay) == bbox_rows(unlay)
    finally:
        shutil.rmtree(lay, ignore_errors=True)
        shutil.rmtree(unlay, ignore_errors=True)
