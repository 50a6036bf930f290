"""Adversarial-input sweep (VERDICT r7 #5): EVERY registered query runs
against a corrupted, schema-identical copy of the testdata and must
hash-match its DuckDB oracle on the same corrupted parquet (both
engines read identical bytes, so parity — not a hand-written expected
value — is the assertion, exactly the empty-input sweep's playbook).

Input classes injected, each of which a 100 TB ingest WILL contain:

- NULL join keys (l_orderkey, o_custkey, ps keys) and NULL group keys
  (l_returnflag, event_type) — NULL groups must agree cross-engine;
  inner joins must drop them identically.
- NaN / +-Inf in money columns (l_extendedprice, l_discount,
  o_totalprice, events.value) and in embedding components; a zero
  vector and an empty array (cosine's 0-norm edge).
- Zero-length, whitespace-only, and astral-plane unicode text
  (emoji + musical symbols + U+10FFFF), combining marks, NULL text.
- NULL timestamps (l_shipdate, events.ts) — date_trunc/window edges.
- Malformed JSON in events.props.
- A single-row variant of every table (tests/test_single_row fixture
  below) — partial aggregates, windows, and joins at cardinality 1.

Operators whose CONTRACT excludes an input class assert their
documented loud refusal instead (same mechanism as the empty sweep's
CONTRACT_ERRORS). Engine divergences found by the sweep are pinned
individually with a canary, never silently skipped.
"""

from __future__ import annotations

import math
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cloud_dataflow_batch_processing_spark.queries import REGISTRY, queries
from tests.oracle import run_parity

queries()

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

SRC = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

NAN, INF = float("nan"), float("inf")

# Text payloads: empty, whitespace-only, astral-plane (surrogate-pair
# territory for UTF-16-based engines), combining marks, single char.
ADV_TEXTS = [
    "",
    "   \t  \n ",
    "\U0001F600\U0001D11E\U0010FFFF astral plane doc \U0001F600",
    "café combining é acute á",
    "x",
    None,
]


def _append_rows(path: str, out_path: str, rows: list[dict]) -> None:
    """Append ``rows`` (dicts keyed by column name; missing keys =
    NULL) to the parquet at ``path``, preserving its exact schema."""
    table = pq.read_table(path)
    cols = {
        f.name: [r.get(f.name) for r in rows] for f in table.schema
    }
    extra = pa.table(
        {n: pa.array(v, type=table.schema.field(n).type) for n, v in cols.items()}
    )
    pq.write_table(
        pa.concat_tables([table, extra]), out_path,
        # match the testdata's physical layout closely enough for both
        # readers (plain enc is fine; schema is what matters)
    )


def _adv_rows(table: str, dim: int) -> list[dict]:
    if table == "lineitem":
        base = dict(l_linenumber=1, l_quantity=1.0, l_extendedprice=100.0,
                    l_discount=0.05, l_tax=0.02, l_returnflag="N",
                    l_linestatus="O")
        return [
            {**base, "l_orderkey": None, "l_partkey": 1, "l_suppkey": 1},
            {**base, "l_orderkey": 1, "l_partkey": None, "l_suppkey": None},
            {**base, "l_orderkey": 2, "l_partkey": 2, "l_suppkey": 2,
             "l_returnflag": None, "l_linestatus": None},
            {**base, "l_orderkey": 3, "l_partkey": 3, "l_suppkey": 3,
             "l_quantity": None, "l_extendedprice": None, "l_discount": None},
            {**base, "l_orderkey": 4, "l_partkey": 4, "l_suppkey": 4,
             "l_shipdate": None},
        ]
    if table == "orders":
        return [
            dict(o_orderkey=900001, o_custkey=None, o_orderstatus="O",
                 o_totalprice=1.0, o_orderpriority="1-URGENT"),
            dict(o_orderkey=900002, o_custkey=1, o_orderstatus=None,
                 o_totalprice=None, o_orderdate=None, o_orderpriority=None),
        ]
    if table == "events":
        return [
            dict(event_id=900001, user_id=None, event_type="click", value=1.0,
                 props="{}"),
            dict(event_id=900002, user_id=1, event_type=None, value=None,
                 props="{not json"),
            dict(event_id=900003, user_id=2, event_type="view", value=2.0,
                 props=None),
        ]
    if table == "documents":
        return [
            dict(doc_id=900000 + i, text=t, lang=None if t is None else "en",
                 source="adv", n_chars=len(t) if t else 0)
            for i, t in enumerate(ADV_TEXTS)
        ]
    if table == "embeddings":
        return [
            dict(vec_id=900001, embedding=[0.0] * dim, label=0),
            dict(vec_id=900002, embedding=None, label=None),
            dict(vec_id=900003, embedding=[1.0] + [0.0] * (dim - 1), label=1),
            dict(vec_id=900004, embedding=[NAN] + [0.5] * (dim - 1), label=2),
            dict(vec_id=900005, embedding=[INF] + [0.5] * (dim - 1), label=2),
            dict(vec_id=900006, embedding=[], label=3),
        ]
    if table == "customer":
        return []  # keyed dims stay well-formed; fact-side NULLs cover the join classes
    return []


@pytest.fixture(scope="session")
def adversarial_sf_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sf_adv"))
    dim = len(
        pq.read_table(os.path.join(SRC, "embeddings.parquet"))["embedding"][0]
    )
    for t in TABLES:
        _append_rows(
            os.path.join(SRC, f"{t}.parquet"),
            os.path.join(out, f"{t}.parquet"),
            _adv_rows(t, dim),
        )
    return out


@pytest.fixture(scope="session")
def single_row_sf_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sf_one"))
    for t in TABLES:
        pq.write_table(
            pq.read_table(os.path.join(SRC, f"{t}.parquet")).slice(0, 1),
            os.path.join(out, f"{t}.parquet"),
        )
    return out


# Queries whose oracle comparison is exempted on the adversarial corpus
# with an individually pinned reason (each has a canary below or a
# documented contract assertion). Populated by the sweep's findings.
PINNED_DIVERGENCE: dict[str, str] = {}

# Operators whose contract refuses this corpus loudly.
CONTRACT_ERRORS: dict[str, str] = {}


def _sweep(spark, sf_dir) -> list[str]:
    problems: list[str] = []
    for name in sorted(REGISTRY):
        if name in PINNED_DIVERGENCE:
            continue
        if name in CONTRACT_ERRORS:
            with pytest.raises(ValueError, match=CONTRACT_ERRORS[name]):
                REGISTRY[name].fn(spark, sf_dir).collect()
            continue
        try:
            fails = run_parity(spark, sf_dir, [name])
        except Exception as exc:  # crash = worse than a mismatch
            problems.append(f"{name}: {type(exc).__name__}: {exc}")
            continue
        for msgs in fails.values():
            problems.append(f"{name}: {msgs}")
    return problems


@pytest.mark.slowsweep
def test_registry_adversarial_sweep(spark, adversarial_sf_dir):
    problems = _sweep(spark, adversarial_sf_dir)
    assert not problems, f"{len(problems)} adversarial failures:\n" + "\n".join(problems)


@pytest.mark.slowsweep
def test_registry_single_row_sweep(spark, single_row_sf_dir):
    problems = _sweep(spark, single_row_sf_dir)
    assert not problems, f"{len(problems)} single-row failures:\n" + "\n".join(problems)


@pytest.mark.slowsweep
def test_sql_facade_tiers_on_adversarial_corpus(spark, adversarial_sf_dir):
    """The SQL façade's certified strings (verbatim AND translated)
    must value-match their DataFrame twins on the adversarial corpus
    too — NULL keys/timestamps, NaN/Inf, astral text flowing through
    the DIALECT layer, not just through the DataFrame operators (round
    9: 117/117 green on first run, pinned here so it stays that way)."""
    from cloud_dataflow_batch_processing_spark.sql import sql as engine_sql
    from cloud_dataflow_batch_processing_spark.sql_dialect import translate_duckdb
    from tests.oracle import compare_frames
    from tests.test_sql_facade import (
        TRANSLATED_CERTIFIED,
        TRANSLATED_OPTS,
        VERBATIM_CERTIFIED,
    )

    problems = []
    for name in VERBATIM_CERTIFIED + TRANSLATED_CERTIFIED:
        q = REGISTRY[name]
        # Each name runs with EXACTLY its certified options — the
        # r10-promoted trap names un-barriered would re-enter the
        # quadratic CollapseProject plan and grind this sweep for hours
        # (measured: 30+ min per task, interpreted char-fold eval).
        opts = TRANSLATED_OPTS.get(name, {}) if name in TRANSLATED_CERTIFIED else {}
        text = (
            translate_duckdb(
                q.oracle,
                double_literals=opts.get("double_literals", False),
                inline_where_aliases=opts.get("inline_where_aliases", False),
            )
            if name in TRANSLATED_CERTIFIED
            else q.oracle
        )
        try:
            a = engine_sql(
                spark,
                text,
                adversarial_sf_dir,
                materialize_ctes=opts.get("materialize_ctes", False),
            ).toPandas()
            b = q.fn(spark, adversarial_sf_dir).toPandas()
            errs = compare_frames(a, b, name)
            if errs:
                problems.append(f"{name}: {'; '.join(errs)[:200]}")
        except Exception as exc:
            problems.append(f"{name}: {type(exc).__name__}: {exc}")
    assert not problems, f"{len(problems)} façade adversarial failures:\n" + "\n".join(problems)


# ---------------------------------------------------------------------------
# NaN/Inf in MONEY columns: a DQ-quarantine class, not an analytics
# input. The documented 100 TB posture: the DQ gate counts the rows
# exactly (cross-engine), and analytics over unquarantined non-finite
# money is LOUD (ANSI cast to DECIMAL raises) rather than silently
# wrong. A sweep that instead forced every money aggregate to silently
# skip non-finite rows would hide corruption at scale.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="session")
def nonfinite_money_sf_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sf_nfm"))
    import datetime as dt

    ship = dt.datetime(1995, 6, 1)  # inside q1's shipdate window
    inject = {
        "lineitem": [
            dict(l_orderkey=1, l_partkey=1, l_suppkey=1, l_linenumber=9,
                 l_quantity=NAN, l_extendedprice=INF, l_discount=0.0,
                 l_tax=0.0, l_returnflag="N", l_linestatus="O",
                 l_shipdate=ship),
            dict(l_orderkey=2, l_partkey=2, l_suppkey=2, l_linenumber=9,
                 l_quantity=1.0, l_extendedprice=100.0, l_discount=-INF,
                 l_tax=NAN, l_returnflag="N", l_linestatus="O",
                 l_shipdate=ship),
        ],
        "orders": [
            dict(o_orderkey=900009, o_custkey=1, o_orderstatus="O",
                 o_totalprice=NAN, o_orderpriority="1-URGENT"),
        ],
        "events": [
            dict(event_id=900010, user_id=3, event_type="view", value=INF,
                 props="{}"),
        ],
    }
    for t in TABLES:
        _append_rows(
            os.path.join(SRC, f"{t}.parquet"),
            os.path.join(out, f"{t}.parquet"),
            inject.get(t, []),
        )
    return out


@pytest.mark.slowsweep
def test_dq_gate_counts_non_finite_money_exactly(spark, nonfinite_money_sf_dir):
    fails = run_parity(spark, nonfinite_money_sf_dir, ["dq_violation_summary"])
    assert not any(fails.values()), fails
    rows = {
        r.check_name: r.n_violations
        for r in REGISTRY["dq_violation_summary"].fn(spark, nonfinite_money_sf_dir).collect()
    }
    assert rows["lineitem_non_finite_money"] == 2
    assert rows["orders_non_finite_money"] == 1
    assert rows["events_non_finite_value"] == 1


def test_money_aggregate_skips_non_finite_pinned(spark, nonfinite_money_sf_dir, sf_dir):
    """Pin the engine's actual non-finite-money semantics so it can't
    drift silently: Spark's double→DECIMAL cast maps NaN/±Inf to NULL
    (even under ANSI — measured), so decimal-exact aggregates SKIP the
    poisoned rows; they never propagate a NaN total and never raise.
    (DuckDB would raise on the same cast — which is why these rows are
    NOT an oracle-parity class: the documented posture is that the DQ
    gate above quarantines them BEFORE analytics.) The injected rows
    land in q1's (N, O) group: its decimal sums must equal the clean
    corpus's, while its row count includes the poisoned rows."""
    poisoned = {
        tuple(r)[:2]: r
        for r in REGISTRY["q1_pricing_summary"].fn(spark, nonfinite_money_sf_dir).collect()
    }
    clean = {
        tuple(r)[:2]: r
        for r in REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).collect()
    }
    assert set(poisoned) == set(clean)
    no, ref = poisoned[("N", "O")], clean[("N", "O")]
    assert no.count_order == ref.count_order + 2
    # NaN qty / Inf price cast to NULL and vanish from the sums; the
    # finite components of the poisoned rows (qty 1.0, price 100.0 on
    # the second row) still contribute; disc_price is non-finite on
    # BOTH rows (Inf*(1-0) and 100*(1-(-Inf))) so it is unchanged.
    assert float(no.sum_qty) == float(ref.sum_qty) + 1.0
    assert float(no.sum_base_price) == float(ref.sum_base_price) + 100.0
    assert float(no.sum_disc_price) == float(ref.sum_disc_price)
    for c in ("sum_qty", "sum_base_price", "sum_disc_price", "avg_qty"):
        v = float(no[c])
        assert v == v and abs(v) != float("inf"), f"{c} non-finite"
    for k in (k for k in clean if k != ("N", "O")):
        assert tuple(poisoned[k]) == tuple(clean[k])
