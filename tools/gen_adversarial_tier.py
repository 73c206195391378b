"""Deterministic adversarial-corpus tier (round 13, VERDICT r12 #1).

The r12 mutation lens proved the driver hash gate is only as strong as
its input distribution: nine planted defects slipped because sf0.01
never exercises NULL sources, unseen labels, exact comparison
boundaries, same-instant events, or zero projections — each got a
bespoke planted pytest.  This generator closes that blindness
STRUCTURALLY: it takes the natural sf0.001 tier as substrate and
appends a systematic census of every boundary class the lens named,
so running the FULL oracle-parity suite against the result gives every
query — current and future — boundary coverage by construction.

Planted classes (one subsection per table below):

- NULLs in every nullable NON-KEY column of every table (the natural
  tiers contain zero NULLs anywhere — measured, see MUTATION.md wave
  2); primary-key-style columns (event_id, *_orderkey, doc_id, vec_id,
  c_custkey...) stay non-NULL per the engine's documented PK contract
  (silver MERGE and the dedup stores require non-NULL keys; a NULL
  equi-join key also cannot be oracle-matched without IS NOT DISTINCT
  FROM on every join) — region.r_regionkey is the deliberate
  exception, exercising a NULL dimension key through the join chain;
- values exactly AT every documented filter/check/band boundary
  (value 0/1/50/100/150/200; l_discount 0.05; l_quantity 30;
  o_totalprice at the 125k/250k/375k band edges; ts at the p3
  2024-01-10/2024-01-20 range ends and the 2024-01-15 cutoff);
- same-instant event pairs (as-of join and funnel step ties), an
  exact-30-minute session gap, an exact-10-minute view->purchase lag,
  an exact-60-second burst-window edge, a purchase exactly AT signup;
- a user whose every event has NULL ts (the M30 dedup batch face);
- unseen categories (event_type/lang/source/segment/brand/priority
  absent from the natural domain) and orphan foreign keys on every
  join edge (the M4 global-mean fallback shape);
- empty and 1-row groups (a customer with no orders, a region with no
  nations, a single-event user);
- duplicate keys with identical AND with differing content;
- a hapax tail (docs of globally-unique tokens), exact- and
  near-duplicate doc pairs, boilerplate repetition, whitespace-only /
  empty / single-token texts, unicode (accents+CJK+emoji), PII-shaped
  strings;
- zero vectors (norm 0), extreme-magnitude vectors (1e4/1e-30 —
  capped where cross-engine SUM-ordering ulps stay below the ROUND
  grain, see the in-place comments),
  exact-duplicate / scaled / antipodal embedding pairs.

Honest exclusions (documented, not silent): NaN/Infinity literals and
zero-length embedding lists are NOT planted — engine-level NaN
ordering and empty-list conventions differ between Spark and DuckDB in
ways that say nothing about THIS repo's query semantics, and every
embedding consumer documents a fixed-dimension input contract.

Output is byte-deterministic: hand-specified rows only (no RNG, no
clock), written with each base table's OWN arrow schema, one file per
table, plus a TIER_VERSION stamp so caches regenerate on change.

Usage: python tools/gen_adversarial_tier.py [out_dir]
       (default /root/repo/.benchdata/adversarial)
"""

from __future__ import annotations

import os
import sys
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.001"
DEFAULT_OUT = "/root/repo/.benchdata/adversarial"
# bump when planted rows change so cached tiers regenerate
TIER_VERSION = "r14.1"

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


# Planted keys start high above any natural key so unintended
# collisions are impossible; collisions below are always deliberate.
K = 9_000_000


def _hapax(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}hapax{i:03d}" for i in range(n))


def planted_rows() -> dict[str, list[dict]]:
    rows: dict[str, list[dict]] = {}

    rows["region"] = [
        {"r_regionkey": 5, "r_name": None},            # NULL name
        {"r_regionkey": 6, "r_name": "SPACE"},         # region w/o nations,
                                                       # unseen by j2's map
        {"r_regionkey": None, "r_name": "GHOST"},      # NULL key
    ]

    rows["nation"] = [
        {"n_nationkey": 25, "n_name": None, "n_regionkey": 0},
        {"n_nationkey": 26, "n_name": "ATLANTIS", "n_regionkey": None},
        {"n_nationkey": 27, "n_name": "ELBONIA", "n_regionkey": 99},  # orphan
    ]

    rows["customer"] = [
        # one NULL per nullable column
        {"c_custkey": K + 1, "c_name": None, "c_nationkey": 1,
         "c_acctbal": 10.0, "c_mktsegment": "MACHINERY"},
        {"c_custkey": K + 2, "c_name": "null-nation", "c_nationkey": None,
         "c_acctbal": 10.0, "c_mktsegment": "MACHINERY"},
        {"c_custkey": K + 3, "c_name": "null-bal", "c_nationkey": 1,
         "c_acctbal": None, "c_mktsegment": "MACHINERY"},
        {"c_custkey": K + 4, "c_name": "null-seg", "c_nationkey": 1,
         "c_acctbal": 10.0, "c_mktsegment": None},
        # unseen segment (M17 label shape), zero and negative balances
        {"c_custkey": K + 5, "c_name": "aero", "c_nationkey": 2,
         "c_acctbal": 0.0, "c_mktsegment": "AEROSPACE"},
        {"c_custkey": K + 6, "c_name": "debtor", "c_nationkey": 2,
         "c_acctbal": -999.99, "c_mktsegment": "BUILDING"},
        # customer with NO orders (empty group / anti-join member)
        {"c_custkey": K + 7, "c_name": "no-orders", "c_nationkey": 3,
         "c_acctbal": 1.0, "c_mktsegment": "HOUSEHOLD"},
        # customer in an orphan nation (join chain breaks mid-path)
        {"c_custkey": K + 8, "c_name": "orphan-nation", "c_nationkey": 98,
         "c_acctbal": 1.0, "c_mktsegment": "AUTOMOBILE"},
    ]

    rows["supplier"] = [
        {"s_suppkey": K + 1, "s_name": None, "s_nationkey": 1,
         "s_acctbal": 5.0},
        {"s_suppkey": K + 2, "s_name": "null-nation", "s_nationkey": None,
         "s_acctbal": 5.0},
        {"s_suppkey": K + 3, "s_name": "null-bal", "s_nationkey": 1,
         "s_acctbal": None},
        {"s_suppkey": K + 4, "s_name": "orphan-nation", "s_nationkey": 97,
         "s_acctbal": 0.0},
    ]

    rows["part"] = [
        {"p_partkey": K + 1, "p_name": None, "p_brand": "Brand#1",
         "p_type": "ECONOMY", "p_size": 1, "p_retailprice": 100.0},
        {"p_partkey": K + 2, "p_name": "null-brand", "p_brand": None,
         "p_type": "ECONOMY", "p_size": 1, "p_retailprice": 100.0},
        {"p_partkey": K + 3, "p_name": "null-type", "p_brand": "Brand#1",
         "p_type": None, "p_size": 1, "p_retailprice": 100.0},
        {"p_partkey": K + 4, "p_name": "null-size", "p_brand": "Brand#1",
         "p_type": "ECONOMY", "p_size": None, "p_retailprice": 100.0},
        {"p_partkey": K + 5, "p_name": "null-price", "p_brand": "Brand#1",
         "p_type": "ECONOMY", "p_size": 1, "p_retailprice": None},
        {"p_partkey": K + 6, "p_name": "unseen", "p_brand": "Brand#99",
         "p_type": "QUANTUM", "p_size": 0, "p_retailprice": 0.0},
    ]

    D = _ts  # noqa: N806 - local alias for readability
    rows["orders"] = [
        # NULL per nullable column
        {"o_orderkey": K + 1, "o_custkey": None, "o_orderstatus": "O",
         "o_totalprice": 100.0, "o_orderdate": D("1996-06-01"),
         "o_orderpriority": "3-MEDIUM"},
        {"o_orderkey": K + 2, "o_custkey": 1, "o_orderstatus": None,
         "o_totalprice": 100.0, "o_orderdate": D("1996-06-01"),
         "o_orderpriority": "3-MEDIUM"},
        {"o_orderkey": K + 3, "o_custkey": 1, "o_orderstatus": "O",
         "o_totalprice": None, "o_orderdate": D("1996-06-01"),
         "o_orderpriority": "3-MEDIUM"},
        {"o_orderkey": K + 4, "o_custkey": 1, "o_orderstatus": "O",
         "o_totalprice": 100.0, "o_orderdate": None,
         "o_orderpriority": "3-MEDIUM"},
        {"o_orderkey": K + 5, "o_custkey": 1, "o_orderstatus": "O",
         "o_totalprice": 100.0, "o_orderdate": D("1996-06-01"),
         "o_orderpriority": None},
        # orphan custkey (M4's global-mean fallback shape on join edges)
        {"o_orderkey": K + 6, "o_custkey": 8_888_888, "o_orderstatus": "F",
         "o_totalprice": 200.0, "o_orderdate": D("1996-06-02"),
         "o_orderpriority": "1-URGENT"},
        # o_totalprice exactly AT each half-open band edge [lo, hi)
        {"o_orderkey": K + 7, "o_custkey": 2, "o_orderstatus": "O",
         "o_totalprice": 125000.0, "o_orderdate": D("1996-06-03"),
         "o_orderpriority": "2-HIGH"},
        {"o_orderkey": K + 8, "o_custkey": 2, "o_orderstatus": "O",
         "o_totalprice": 250000.0, "o_orderdate": D("1996-06-03"),
         "o_orderpriority": "2-HIGH"},
        {"o_orderkey": K + 9, "o_custkey": 2, "o_orderstatus": "O",
         "o_totalprice": 375000.0, "o_orderdate": D("1996-06-03"),
         "o_orderpriority": "2-HIGH"},
        # zero and band-floor boundary
        {"o_orderkey": K + 10, "o_custkey": 2, "o_orderstatus": "P",
         "o_totalprice": 0.0, "o_orderdate": D("1996-06-04"),
         "o_orderpriority": "5-LOW"},
        # unseen status + priority
        {"o_orderkey": K + 11, "o_custkey": 3, "o_orderstatus": "X",
         "o_totalprice": 50.0, "o_orderdate": D("1996-06-05"),
         "o_orderpriority": "9-EXTRA"},
        # same-date pair (date-grain tie)
        {"o_orderkey": K + 12, "o_custkey": 3, "o_orderstatus": "O",
         "o_totalprice": 60.0, "o_orderdate": D("1996-06-06"),
         "o_orderpriority": "4-NOT SPECIFIED"},
        {"o_orderkey": K + 13, "o_custkey": 3, "o_orderstatus": "O",
         "o_totalprice": 60.0, "o_orderdate": D("1996-06-06"),
         "o_orderpriority": "4-NOT SPECIFIED"},
    ]

    li_base = {"l_quantity": 1.0, "l_extendedprice": 100.0,
               "l_discount": 0.0, "l_tax": 0.01, "l_returnflag": "N",
               "l_linestatus": "O", "l_shipdate": D("1996-07-01")}
    def li(ok, ln, **kw):  # noqa: E306
        r = {"l_orderkey": ok, "l_partkey": 1, "l_suppkey": 1,
             "l_linenumber": ln, **li_base}
        r.update(kw)
        return r

    rows["lineitem"] = [
        # NULL per nullable column
        li(K + 1, 1, l_partkey=None),
        li(K + 1, 2, l_suppkey=None),
        li(K + 1, 3, l_quantity=None),
        li(K + 1, 4, l_extendedprice=None),
        li(K + 1, 5, l_discount=None),
        li(K + 1, 6, l_tax=None),
        li(K + 1, 7, l_returnflag=None),
        li(K + 1, 8, l_linestatus=None),
        li(K + 1, 9, l_shipdate=None),
        # exactly AT the documented boundaries: discount 0.05 is NOT
        # "> 0.05"-discounted; quantity 30 IS ">= 30"-bulk
        li(K + 2, 1, l_discount=0.05),
        li(K + 2, 2, l_quantity=30.0),
        # orphan foreign keys on every edge
        li(7_777_777, 1),                       # orderkey not in orders
        li(K + 3, 1, l_partkey=7_777_777),      # partkey not in part
        li(K + 3, 2, l_suppkey=7_777_777),      # suppkey not in supplier
        # duplicate (orderkey, linenumber) with identical then differing
        # content (a12's duplicate-key census)
        li(K + 4, 1),
        li(K + 4, 1),
        li(K + 4, 1, l_extendedprice=999.0),
        # unseen flag/status pair
        li(K + 5, 1, l_returnflag="Z", l_linestatus="Z"),
    ]

    def ev(eid, ts, uid, typ, val, props='{"k": 1}'):
        return {"event_id": eid, "ts": ts, "user_id": uid,
                "event_type": typ, "value": val, "props": props}

    T = _ts  # noqa: N806
    rows["events"] = [
        # NULL per nullable column
        ev(K + 1, None, K + 1, "view", 10.0),
        ev(K + 2, T("2024-01-12 08:00:00"), None, "view", 10.0),
        ev(K + 3, T("2024-01-12 08:01:00"), K + 1, None, 10.0),
        ev(K + 4, T("2024-01-12 08:02:00"), K + 1, "view", None),
        ev(K + 5, T("2024-01-12 08:03:00"), K + 1, "view", 10.0, None),
        # a user whose EVERY event has NULL ts (M30 dedup batch face)
        ev(K + 6, None, K + 2, "click", 5.0),
        ev(K + 7, None, K + 2, "click", 6.0),
        # props edge shapes: malformed, empty, empty-object, null value,
        # wrong type, nested object
        ev(K + 8, T("2024-01-12 09:00:00"), K + 3, "view", 1.0, "not json"),
        ev(K + 9, T("2024-01-12 09:01:00"), K + 3, "view", 1.0, ""),
        ev(K + 10, T("2024-01-12 09:02:00"), K + 3, "view", 1.0, "{}"),
        ev(K + 11, T("2024-01-12 09:03:00"), K + 3, "view", 1.0,
           '{"k": null}'),
        ev(K + 12, T("2024-01-12 09:04:00"), K + 3, "view", 1.0,
           '{"k": "str"}'),
        ev(K + 13, T("2024-01-12 09:05:00"), K + 3, "view", 1.0,
           '{"k": {"n": 1}}'),
        # value exactly AT every histogram/risk/threshold boundary
        ev(K + 14, T("2024-01-13 10:00:00"), K + 4, "error", 0.0),
        ev(K + 15, T("2024-01-13 10:01:00"), K + 4, "error", 1.0),
        ev(K + 16, T("2024-01-13 10:02:00"), K + 4, "error", 50.0),
        ev(K + 17, T("2024-01-13 10:03:00"), K + 4, "error", 100.0),
        ev(K + 18, T("2024-01-13 10:04:00"), K + 4, "error", 150.0),
        ev(K + 19, T("2024-01-13 10:05:00"), K + 4, "error", 200.0),
        # negative and large magnitudes.  1e9, NOT 1e15 (measured): at
        # 1e15 the ulp (~0.125) exceeds the engines' ROUND(,2) grain, so
        # cross-engine SUM ordering alone flips the last digit — a
        # float-associativity artifact, not a semantics gap; at 1e9 the
        # ulp (~1.2e-7) is absorbed and the parity is semantic again
        ev(K + 20, T("2024-01-13 10:06:00"), K + 4, "error", -50.0),
        ev(K + 21, T("2024-01-13 10:07:00"), K + 4, "error", 1.0e9),
        # ts exactly AT the p3 inclusive range ends and the so1 cutoff
        ev(K + 22, T("2024-01-10 00:00:00"), K + 5, "view", 2.0),
        ev(K + 23, T("2024-01-20 00:00:00"), K + 5, "view", 2.0),
        ev(K + 24, T("2024-01-15 00:00:00"), K + 5, "view", 2.0),
        # same-instant pairs: funnel steps at one instant (M23), as-of
        # tie between "transaction" and "quote" instant (M25)
        ev(K + 25, T("2024-01-14 12:00:00"), K + 6, "signup", 1.0),
        ev(K + 26, T("2024-01-14 12:00:00"), K + 6, "view", 1.0),
        ev(K + 27, T("2024-01-14 12:00:00"), K + 6, "click", 1.0),
        ev(K + 28, T("2024-01-14 12:00:00"), K + 6, "purchase", 1.0),
        # exact 30-minute session gap (gap > 30min starts a session; AT
        # the boundary must NOT)
        ev(K + 29, T("2024-01-14 13:00:00"), K + 7, "view", 1.0),
        ev(K + 30, T("2024-01-14 13:30:00"), K + 7, "view", 1.0),
        # and one second PAST the boundary (must split)
        ev(K + 31, T("2024-01-14 14:00:01"), K + 7, "view", 1.0),
        # exact 10-minute view->purchase lag (j8 inclusive upper bound)
        ev(K + 32, T("2024-01-14 15:00:00"), K + 8, "view", 1.0),
        ev(K + 33, T("2024-01-14 15:10:00"), K + 8, "purchase", 9.0),
        # exact 60-second burst-frame edge (w5 RANGE -60 inclusive)
        ev(K + 34, T("2024-01-14 16:00:00"), K + 9, "click", 1.0),
        ev(K + 35, T("2024-01-14 16:01:00"), K + 9, "click", 1.0),
        # purchase exactly AT signup (a24 ts >= signup_ts qualifies);
        # purchase BEFORE signup on another user (must not qualify)
        ev(K + 36, T("2024-01-15 09:00:00"), K + 10, "signup", 1.0),
        ev(K + 37, T("2024-01-15 09:00:00"), K + 10, "purchase", 3.0),
        ev(K + 38, T("2024-01-15 09:00:00"), K + 11, "purchase", 3.0),
        ev(K + 39, T("2024-01-15 10:00:00"), K + 11, "signup", 1.0),
        # duplicate event_id with IDENTICAL content only: the s8 MERGE
        # oracle reproduces the per-key collapse via DISTINCT, but the
        # survivor pick among DIFFERING-content duplicates is Spark's
        # xxhash64 tiebreak — not oracle-expressible, so that shape
        # lives on lineitem (a12 censuses it without picking survivors)
        # and in tests/test_merge_property.py
        ev(K + 40, T("2024-01-16 08:00:00"), K + 12, "view", 4.0),
        ev(K + 40, T("2024-01-16 08:00:00"), K + 12, "view", 4.0),
        # unseen event_type (label-encode / domain-pin shape)
        ev(K + 42, T("2024-01-16 09:00:00"), K + 13, "unseen_type", 1.0),
        # single-event user
        ev(K + 43, T("2024-01-17 09:00:00"), K + 14, "purchase", 7.0),
        # midnight exactly + month boundary + end-of-January tick
        ev(K + 44, T("2024-01-11 00:00:00"), K + 15, "view", 1.0),
        ev(K + 45, T("2024-01-31 23:59:59.999999"), K + 15, "view", 1.0),
        ev(K + 46, T("2024-02-01 00:00:00"), K + 15, "view", 1.0),
    ]

    def doc(i, text, lang="en", source="srcA"):
        return {"doc_id": i, "text": text, "lang": lang, "source": source,
                "n_chars": None if text is None else len(text)}

    rows["documents"] = [
        doc(K + 1, None),                        # NULL text
        doc(K + 2, ""),                          # empty
        doc(K + 3, " \t\n "),                    # whitespace-only
        doc(K + 4, "solitary"),                  # single token
        doc(K + 5, "two words"),                 # below 3-gram width
        doc(K + 6, "the quick brown fox jumps", lang=None),   # NULL lang
        doc(K + 7, "the quick brown fox jumps", lang="xx"),   # unseen lang
        doc(K + 8, "the quick brown fox jumps", source=None), # NULL source
        doc(K + 9, "the quick brown fox jumps", source="srcX"),  # unseen src
        # exact-duplicate pair (different doc_ids, identical text)
        doc(K + 10, "value table row scan filter join window agg"),
        doc(K + 11, "value table row scan filter join window agg"),
        # near-duplicate (one token changed)
        doc(K + 12, "value table row scan filter join window sum"),
        # boilerplate: one 3-gram repeated (repetition / novelty floor)
        doc(K + 13, "spark is fast " * 12),
        # hapax tail: three docs of globally-unique tokens
        doc(K + 14, _hapax("alpha", 40), source=None),
        doc(K + 15, _hapax("beta", 40), source="srcX"),
        doc(K + 16, _hapax("gamma", 40)),
        # PII-shaped strings at their regex boundaries
        doc(K + 17, "ssn 123-45-6789 mail a.b@example.com phone "
                    "555-867-5309 card 4111 1111 1111 1111 end"),
        # unicode: accents, CJK, emoji; multi-space and tab runs
        doc(K + 18, "café ÉLAN 北京 数据 🚀 test"),
        doc(K + 19, "tabs\tand  double  spaces\nnewline end"),
        # same text under two different langs (grouping-key contrast)
        doc(K + 20, "shared text across languages", lang="en"),
        doc(K + 21, "shared text across languages", lang="de"),
    ]

    dim = 64
    def emb(i, vec, label=0):  # noqa: E306
        return {"vec_id": i, "embedding": vec, "label": label}

    unit = [0.0] * dim
    unit[0] = 1.0
    ramp = [float(j) / dim for j in range(dim)]
    rows["embeddings"] = [
        emb(K + 1, [0.0] * dim),                 # zero vector (norm 0)
        emb(K + 2, None),                        # NULL embedding
        emb(K + 3, unit, label=None),            # NULL label
        emb(K + 4, unit, label=99),              # unseen label
        # 1e4, NOT 1e30: same ulp-vs-ROUND argument as events.value —
        # centroid/error rollups at 1e29 diverge per-engine on SUM
        # ordering alone, and even 1e6 puts the per-dim VARIANCE at
        # ~2e9 where a 1-ulp (2.4e-7) formula difference crosses the
        # ROUND(6) grain (measured ...652690 vs ...652691); at 1e4 the
        # variance sits ~2e5 with 4 orders of margin, while the dot
        # products still stress 1e9-scale accumulation
        emb(K + 5, [1.0e4] * dim),               # extreme magnitude
        emb(K + 6, [1.0e-30] * dim),             # denormal-adjacent
        # exact duplicate, scaled copy (cosine 1.0), antipodal (-1.0)
        emb(K + 7, ramp, label=1),
        emb(K + 8, ramp, label=1),
        emb(K + 9, [2.0 * x for x in ramp], label=1),
        emb(K + 10, [-x for x in ramp], label=1),
    ]

    # transitive near-dup chain (r14, ADVICE r13): three vectors on an
    # arc at 2/9/16 degrees in the dims-10/11 plane — consecutive
    # pairs are 7 deg apart (cos ~0.99255, above SEMANTIC_EPS=0.99 ~
    # 8.11 deg) but the endpoints are 14 deg (cos ~0.97, below), so
    # the middle vector both drops AND dominates: a survivor remap
    # through the direct witness dangles unless dup_of resolves to
    # the kept chain root.  Mutually ~7 deg apart and far from every
    # other planted/natural direction, the trio quantizes into one
    # cell (pinned by tests/test_dedup_semantic.py's tier test).
    def on_arc(deg_angle, d0, d1):
        import math as _m

        v = [0.0] * dim
        v[d0] = _m.cos(_m.radians(deg_angle))
        v[d1] = _m.sin(_m.radians(deg_angle))
        return v

    rows["embeddings"] += [
        emb(K + 11, on_arc(2.0, 10, 11), label=2),
        emb(K + 12, on_arc(9.0, 10, 11), label=2),
        emb(K + 13, on_arc(16.0, 10, 11), label=2),
    ]
    # whole-cell mutual-eps flood (r14, VERDICT r13 #5b): six vectors
    # within 2.5 deg of one direction (dims 20/21) — EVERY pair is
    # within eps, the degenerate cell the max_block cap exists for.
    # Uncapped, the census keeps exactly the cluster-edge member and
    # drops the rest; capped below the cell size, the whole cell is
    # excluded from pairing and every member KEEPS (the documented
    # explicit-exclusion semantics, pinned on this tier).
    rows["embeddings"] += [
        emb(K + 14 + j, on_arc(0.5 * j, 20, 21), label=3)
        for j in range(6)
    ]

    return rows


def generate(out_dir: str = DEFAULT_OUT) -> str:
    os.makedirs(out_dir, exist_ok=True)
    planted = planted_rows()
    for t in TABLES:
        base = pq.read_table(os.path.join(BASE, f"{t}.parquet"))
        extra = pa.Table.from_pylist(planted[t], schema=base.schema)
        pq.write_table(
            pa.concat_tables([base, extra]),
            os.path.join(out_dir, f"{t}.parquet"),
        )
    with open(os.path.join(out_dir, "TIER_VERSION"), "w") as fh:
        fh.write(TIER_VERSION + "\n")
    return out_dir


def ensure(out_dir: str = DEFAULT_OUT) -> str:
    """Generate only if absent or stale (version stamp mismatch)."""
    stamp = os.path.join(out_dir, "TIER_VERSION")
    try:
        with open(stamp) as fh:
            if fh.read().strip() == TIER_VERSION:
                return out_dir
    except OSError:
        pass
    return generate(out_dir)


if __name__ == "__main__":
    out = generate(sys.argv[1] if len(sys.argv) > 1 else DEFAULT_OUT)
    print(f"adversarial tier {TIER_VERSION} -> {out}")
