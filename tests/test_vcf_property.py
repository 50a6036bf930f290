"""Seeded-random VCF property sweep: sources/vcf.py vs an INDEPENDENT
pure-Python oracle implementing the Beam record semantics
(beam/io/vcfio.py:343-414) directly from each generated record's
component values — not from the serialized line — so a serialization
or parse defect on either side surfaces as a field mismatch.

Same house style as tests/test_sql_dialect_property.py: deterministic
seed, many compositions, ONE distributed run (per-example Spark jobs
would be 100x slower for the same coverage).
"""

from __future__ import annotations

import random

from cloud_dataflow_batch_processing_spark.sources.vcf import read_vcf, write_vcf_lines

SEED = 20260816
N_RECORDS = 300

HDR = [
    "##fileformat=VCFv4.2",
    '##INFO=<ID=NS,Number=1,Type=Integer,Description="x">',
    '##INFO=<ID=AF,Number=A,Type=Float,Description="x">',
    '##INFO=<ID=DB,Number=0,Type=Flag,Description="x">',
    '##INFO=<ID=HQ,Number=.,Type=String,Description="x">',
    '##FORMAT=<ID=GT,Number=1,Type=String,Description="x">',
    '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="x">',
    '##FORMAT=<ID=PS,Number=1,Type=Integer,Description="x">',
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2",
]
SAMPLES = ["S1", "S2"]
INFO_COUNTS = {"NS": "1", "AF": "A", "DB": "0", "HQ": None}  # None = '.'


def _gen_record(rng: random.Random, pos: int) -> dict:
    """One record as COMPONENTS (ground truth), plus its VCF line."""
    chrom = rng.choice(["chr1", "chr2", "chrX"])
    names = rng.choice([[], [f"rs{pos}"], [f"rs{pos}", f"rs{pos}b"]])
    ref = rng.choice(["A", "C", "GT", "ACG", "."])
    alts = rng.choice([[], ["T"], ["T", "TA"], ["."], ["T", "."]])
    qual = rng.choice([None, 0.0, 7.0, 29.5, 100.0])
    filters = rng.choice([None, "PASS", ["q10"], ["q10", "s50"]])
    info: dict = {}
    if rng.random() < 0.8:
        info["NS"] = [str(rng.randrange(10))]
    if rng.random() < 0.5:
        info["AF"] = [rng.choice(["0.5", "0.25"]) for _ in range(len([a for a in alts if a != "."]) or 1)]
    if rng.random() < 0.4:
        info["DB"] = []  # flag
    if rng.random() < 0.3:
        info["HQ"] = ["a", "bb"]
    end_override = rng.random() < 0.25
    fmt = rng.choice([["GT"], ["GT", "DP"], ["GT", "PS", "DP"], ["DP"]])
    calls = []
    for _ in SAMPLES:
        gt = rng.choice([None, ".", "0|1", "1/1", "./1", "0/0", "1|1|0"])
        dp = rng.choice([None, ".", str(rng.randrange(50))])
        ps = rng.choice([None, ".", str(rng.randrange(1, 9))])
        calls.append({"GT": gt, "DP": dp, "PS": ps})

    # --- serialize (missing trailing FORMAT values collapse to '.') ---
    def sval(call):
        return ":".join(
            (call[k] if call[k] is not None else ".") for k in fmt
        )

    info_parts = []
    for k, v in info.items():
        info_parts.append(k if k == "DB" else f"{k}={','.join(v)}")
    if end_override:
        info_parts.append(f"END={pos + 10}")
    line = "\t".join(
        [
            chrom,
            str(pos),
            ";".join(names) if names else ".",
            ref,
            ",".join(alts) if alts else ".",
            "." if qual is None else (str(int(qual)) if qual == int(qual) else str(qual)),
            (
                "."
                if filters is None
                else ("PASS" if filters == "PASS" else ";".join(filters))
            ),
            ";".join(info_parts) if info_parts else ".",
            ":".join(fmt),
            *[sval(c) for c in calls],
        ]
    )

    # --- independent expected Variant (Beam semantics, from components) ---
    exp_info = {}
    for k, v in info.items():
        exp_info[k] = {"data": v, "field_count": INFO_COUNTS[k]}
    exp_calls = []
    for name, call in zip(SAMPLES, calls):
        gt = call["GT"] if "GT" in fmt else None
        if gt is None or gt == ".":
            genotype = [-1]
        else:
            genotype = [-1 if a == "." else int(a) for a in gt.replace("|", "/").split("/")]
        ps = call["PS"] if "PS" in fmt else None
        if ps is not None and ps != ".":
            phaseset = ps
        elif gt is not None and "|" in (gt or ""):
            phaseset = "*"
        else:
            phaseset = None
        cinfo = {}
        for k in fmt:
            if k in ("GT", "PS"):
                continue
            cinfo[k] = call[k] if call[k] is not None else "."
        exp_calls.append(
            {"name": name, "genotype": genotype, "phaseset": phaseset, "info": cinfo}
        )
    expected = {
        "reference_name": chrom,
        "start": pos - 1,
        "end": (pos + 10) if end_override else (pos - 1 + len(ref)),
        "reference_bases": None if ref == "." else ref,
        "alternate_bases": [a for a in alts if a != "."],
        "names": names,
        "quality": qual,
        "filters": (
            []
            if filters is None
            else (["PASS"] if filters == "PASS" else filters)
        ),
        "info": exp_info,
        "calls": exp_calls,
    }
    return {"line": line, "expected": expected}


def test_random_records_roundtrip_vs_python_oracle(spark, tmp_path):
    rng = random.Random(SEED)
    recs = [_gen_record(rng, pos) for pos in range(1, N_RECORDS + 1)]
    path = str(tmp_path / "prop.vcf")
    write_vcf_lines(
        spark.createDataFrame([(r["line"],) for r in recs], "value string"),
        path,
        HDR,
    )
    got = {
        r["start"]: r.asDict(recursive=True)
        for r in read_vcf(spark, path).collect()
    }
    assert len(got) == N_RECORDS
    mismatches = []
    for rec in recs:
        exp = rec["expected"]
        act = got[exp["start"]]
        for field, want in exp.items():
            if act[field] != want:
                mismatches.append(
                    f"pos={exp['start'] + 1} field={field}: "
                    f"expected {want!r} got {act[field]!r} line={rec['line']!r}"
                )
    assert not mismatches, f"{len(mismatches)} mismatches:\n" + "\n".join(
        mismatches[:20]
    )
