"""ReadFromVcf twin (sources/vcf.py) vs the reference record model.

Expected values are hand-derived from beam/io/vcfio.py's PyVCF-record →
Variant conversion (:343-414): 0-based start, END-key end override,
``.``-vs-PASS filter shapes, flag INFO keys, phaseset ``*`` defaulting,
missing-genotype -1. Multi-file reads must honor PER-FILE headers
(sample columns differ per file) — the reference parses each file's
header separately (vcfio.py:265-290).
"""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import functions as F

from cloud_dataflow_batch_processing_spark.sources.vcf import (
    VARIANT_SCHEMA,
    info_values_as,
    read_vcf,
    read_vcf_malformed,
    write_vcf_lines,
)

HDR_A = [
    "##fileformat=VCFv4.2",
    '##INFO=<ID=NS,Number=1,Type=Integer,Description="n">',
    '##INFO=<ID=AF,Number=A,Type=Float,Description="af">',
    '##INFO=<ID=DB,Number=0,Type=Flag,Description="db">',
    '##INFO=<ID=HQ,Number=.,Type=String,Description="hq">',
    '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">',
    '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="d">',
    '##FORMAT=<ID=PS,Number=1,Type=Integer,Description="p">',
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tNA1\tNA2",
]
RECS_A = [
    "chr1\t100\trs1;rs2\tAC\tA,ACT\t29.5\tPASS\tNS=3;AF=0.5,0.33;DB\tGT:DP\t0|1:14\t1/1:11",
    "chr1\t200\t.\tT\t.\t.\t.\tNS=1\tGT:PS:DP\t.:7:5\t0/0:.:3",
    "chr2\t300\trs9\tG\tGA\t10\tq10;s50\tEND=400;HQ=a,b\tGT\t./1\t.",
]

# Different sample columns than file A — per-file header coverage.
HDR_B = [
    "##fileformat=VCFv4.2",
    '##INFO=<ID=NS,Number=1,Type=Integer,Description="n">',
    '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">',
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tSAMP_X",
]
RECS_B = ["chr3\t10\t.\tA\tC\t5\tPASS\tNS=2\tGT\t1|1"]


def _write(spark, base, name, hdr, recs):
    path = os.path.join(base, name)
    write_vcf_lines(
        spark.createDataFrame([(r,) for r in recs], "value string"), path, hdr
    )
    return path


@pytest.fixture(scope="module")
def vcf_dir(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("vcf"))
    _write(spark, base, "a.vcf", HDR_A, RECS_A)
    _write(spark, base, "b.vcf", HDR_B, RECS_B)
    return base


def test_variant_schema_and_fields(spark, vcf_dir):
    df = read_vcf(spark, os.path.join(vcf_dir, "a.vcf"))
    assert df.schema == VARIANT_SCHEMA
    rows = {r["start"]: r.asDict(recursive=True) for r in df.collect()}
    assert set(rows) == {99, 199, 299}

    r1 = rows[99]
    assert r1["reference_name"] == "chr1"
    assert r1["end"] == 101  # start + len(REF)
    assert r1["reference_bases"] == "AC"
    assert r1["alternate_bases"] == ["A", "ACT"]
    assert r1["names"] == ["rs1", "rs2"]
    assert r1["quality"] == 29.5
    assert r1["filters"] == ["PASS"]
    assert r1["info"]["NS"] == {"data": ["3"], "field_count": "1"}
    assert r1["info"]["AF"] == {"data": ["0.5", "0.33"], "field_count": "A"}
    assert r1["info"]["DB"] == {"data": [], "field_count": "0"}  # Flag
    c1, c2 = r1["calls"]
    assert c1 == {
        "name": "NA1",
        "genotype": [0, 1],
        "phaseset": "*",  # |-phased, no PS
        "info": {"DP": "14"},
    }
    assert c2["genotype"] == [1, 1] and c2["phaseset"] is None

    r2 = rows[199]
    assert r2["alternate_bases"] == []  # ALT '.'
    assert r2["names"] == []  # ID '.'
    assert r2["quality"] is None  # QUAL '.'
    assert r2["filters"] == []  # FILTER '.' (vs PASS -> ['PASS'])
    assert r2["calls"][0]["genotype"] == [-1]  # GT '.'
    assert r2["calls"][0]["phaseset"] == "7"  # PS format key wins
    assert r2["calls"][1]["phaseset"] is None  # PS '.' and unphased

    r3 = rows[299]
    assert r3["end"] == 400  # INFO END override
    assert "END" not in r3["info"]  # consumed, not exposed
    assert r3["info"]["HQ"]["field_count"] is None  # Number='.'
    assert r3["filters"] == ["q10", "s50"]
    assert r3["calls"][0]["genotype"] == [-1, 1]  # './1'
    assert r3["calls"][1]["genotype"] == [-1]
    assert r3["calls"][0]["info"] == {}  # FORMAT is GT only


def test_multi_file_per_file_headers(spark, vcf_dir):
    df = read_vcf(spark, os.path.join(vcf_dir, "*.vcf"))
    assert df.count() == 4
    names = {
        r["reference_name"]: [c["name"] for c in r["calls"]]
        for r in df.collect()
    }
    assert names["chr3"] == ["SAMP_X"]
    assert names["chr1"] == ["NA1", "NA2"]


def test_gzip_header_and_records(spark, tmp_path):
    gz = str(tmp_path / "c.vcf.gz")
    body = "\n".join(HDR_B + RECS_B) + "\n"
    with gzip.open(gz, "wt") as f:
        f.write(body)
    rows = read_vcf(spark, gz).collect()
    assert len(rows) == 1
    assert rows[0]["calls"][0]["name"] == "SAMP_X"
    assert rows[0]["calls"][0]["phaseset"] == "*"


def test_info_values_as_typed_access(spark, vcf_dir):
    df = read_vcf(spark, os.path.join(vcf_dir, "a.vcf"))
    af = (
        df.filter(F.col("start") == 99)
        .select(info_values_as(F.col("info"), "AF").alias("af"))
        .collect()[0]["af"]
    )
    assert af == [0.5, 0.33]


def test_malformed_strict_raises(spark, tmp_path):
    path = _write(
        spark,
        str(tmp_path),
        "bad.vcf",
        HDR_B,
        ["chr1\tNOTANUMBER\t.\tA\tC\t1\tPASS\tNS=1\tGT\t0|0", *RECS_B],
    )
    with pytest.raises(Exception, match="malformed VCF record"):
        read_vcf(spark, path).collect()


def test_malformed_tolerant_and_dead_letter(spark, tmp_path):
    bad_lines = [
        "chr1\tNOTANUMBER\t.\tA\tC\t1\tPASS\tNS=1\tGT\t0|0",  # bad POS
        "tooshort\t5",  # < 8 fields
        "chr1\t7\t.\tA\tC\tNaNope\tPASS\tNS=1\tGT\t0|0",  # bad QUAL
    ]
    path = _write(spark, str(tmp_path), "mixed.vcf", HDR_B, RECS_B + bad_lines)
    good = read_vcf(spark, path, allow_malformed_records=True)
    assert good.count() == 1
    dead = read_vcf_malformed(spark, path)
    assert sorted(r["line"] for r in dead.collect()) == sorted(bad_lines)
    assert all("mixed.vcf" in r["file_name"] for r in dead.collect())


def test_no_files_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_vcf(spark, str(tmp_path / "nothing*.vcf")).collect()


def test_parse_is_map_only_no_shuffle(spark, vcf_dir):
    """The parse plan must stay a scan + broadcast header join — a
    shuffle here would re-exchange the full corpus at 100 TB."""
    from cloud_dataflow_batch_processing_spark.plans.inspect import count_shuffles

    df = read_vcf(spark, os.path.join(vcf_dir, "*.vcf"))
    assert count_shuffles(df) == 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_crlf_line_endings(spark, tmp_path):
    """CRLF files must parse identically — Spark's text reader keeps
    the \\r (Beam's TextSource strips it), so the reader strips it
    before the field split or the last sample column is polluted."""
    path = str(tmp_path / "crlf.vcf")
    body = "\r\n".join(HDR_B + RECS_B) + "\r\n"
    with open(path, "w", newline="") as f:
        f.write(body)
    rows = read_vcf(spark, path).collect()
    assert len(rows) == 1
    assert rows[0]["calls"][0]["genotype"] == [1, 1]
    assert rows[0]["calls"][0]["name"] == "SAMP_X"


def test_sites_only_vcf_no_samples(spark, tmp_path):
    """A sites-only VCF (8 fixed columns, no FORMAT/sample columns) —
    calls must be an empty array, not an error."""
    hdr = [
        "##fileformat=VCFv4.2",
        '##INFO=<ID=NS,Number=1,Type=Integer,Description="n">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO",
    ]
    recs = ["chr1\t5\t.\tA\tC\t9\tPASS\tNS=2"]
    path = _write(spark, str(tmp_path), "sites.vcf", hdr, recs)
    rows = read_vcf(spark, path).collect()
    assert len(rows) == 1
    assert rows[0]["calls"] == []
    assert rows[0]["info"]["NS"]["data"] == ["2"]


def test_directory_path_read(spark, tmp_path):
    """A bare directory of plain VCF files (no glob) reads every file,
    with per-file headers — the usual corpus-directory shape."""
    d = tmp_path / "plain"
    d.mkdir()
    (d / "x.vcf").write_text("\n".join(HDR_B + RECS_B) + "\n")
    (d / "y.vcf").write_text(
        "\n".join(HDR_A + RECS_A[:1]) + "\n"
    )
    df = read_vcf(spark, str(d))
    assert df.count() == 2
    names = {r["reference_name"]: [c["name"] for c in r["calls"]] for r in df.collect()}
    assert names == {"chr3": ["SAMP_X"], "chr1": ["NA1", "NA2"]}
