"""The scan-widen gate must derive its expected-split count from the
scan relation's OWN file index (works on any filesystem), not from
``os.stat`` of a local path — on an object store the old gate silently
never widened, exactly where one huge unsplittable file needs it
(r13 verdict #4 / r14). Spark size confs with unit suffixes must also
drive the threshold instead of being swallowed (r14 advice)."""

from __future__ import annotations

from sql_based_etl_spark.queries import _util


class _FakeDF:
    """Minimal stand-in for the widen gate's DataFrame surface."""

    def __init__(self, files):
        self._files = files
        self.widened_to = None

    def inputFiles(self):
        return list(self._files)

    def repartition(self, n):
        self.widened_to = n
        return self


def test_widen_fires_on_single_local_file(spark, tmp_path):
    p = tmp_path / "t.bin"
    p.write_bytes(b"x" * (2 * _util._WIDEN_MIN_BYTES))
    df = _FakeDF([f"file:{p}"])
    out = _util._widen_scan(spark, df, str(p))
    assert out.widened_to == spark.sparkContext.defaultParallelism


def test_no_widen_when_enough_files(spark):
    cores = spark.sparkContext.defaultParallelism
    # enough files to feed every core: no size lookup, no exchange
    # (paths deliberately nonexistent — sizes must not be consulted)
    df = _FakeDF([f"file:/nonexistent/{i}.parquet" for i in range(cores)])
    assert _util._widen_scan(spark, df, "/nonexistent") is df


def test_non_local_path_sizes_via_file_index(spark, monkeypatch):
    # object-store scan: the gate must size files from the scan's file
    # index through the session FS, never os.stat (blind to s3a://)
    seen = []

    def fake_size(s, uri):
        seen.append(uri)
        return 2 * _util._WIDEN_MIN_BYTES

    monkeypatch.setattr(_util, "_file_size", fake_size)
    df = _FakeDF(["s3a://bucket/t/part-0.parquet"])
    out = _util._widen_scan(spark, df, "s3a://bucket/t")
    assert out.widened_to == spark.sparkContext.defaultParallelism
    assert seen == ["s3a://bucket/t/part-0.parquet"]


def test_unknown_size_stays_narrow(spark, monkeypatch):
    # unreadable size: never guess an exchange into the plan
    monkeypatch.setattr(_util, "_file_size", lambda s, u: None)
    df = _FakeDF(["s3a://bucket/t/part-0.parquet"])
    assert _util._widen_scan(spark, df, "s3a://bucket/t") is df


def test_small_scan_stays_narrow(spark, tmp_path):
    p = tmp_path / "small.bin"
    p.write_bytes(b"x" * 1024)  # dimension-table size: never widen
    df = _FakeDF([f"file:{p}"])
    assert _util._widen_scan(spark, df, str(p)) is df


def test_byte_conf_suffixes():
    mb128 = 128 * 1024 * 1024
    assert _util._parse_byte_conf("134217728", 0) == mb128
    assert _util._parse_byte_conf("134217728b", 0) == mb128
    assert _util._parse_byte_conf("128m", 0) == mb128
    assert _util._parse_byte_conf("128MB", 0) == mb128
    assert _util._parse_byte_conf(" 1g ", 0) == 1024**3
    assert _util._parse_byte_conf("garbage", 7) == 7
    assert _util._parse_byte_conf(None, 7) == 7
