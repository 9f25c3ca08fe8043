#!/usr/bin/env python
"""Generate an ALTERNATIVE test fixture with the driver's schemas but a
different seed, different relative table sizes, and deliberately
adversarial (yet in-contract) content — then sweep the registry against
it with ``full_sweep.py <dir>``.

Purpose (round 9, verification-first): every registered query is
oracle-gated on the driver fixture (seed=42), so a query could in
principle be *overfit to that one draw* — e.g. a tie-break that only
looks deterministic because the fixture happens to have no ties, or a
dedup path that looks correct because the fixture has no exact
duplicates.  This generator produces data the queries have NEVER seen,
holding the documented contract (FIXTURES.md) fixed:

- identical schemas/dtypes (int32 vs int64 matters to the hash gate),
  identical value domains (flags, priorities, segments, the 31-token
  documents vocabulary, ``{"k": N}`` props, 1995-2001 order dates,
  2024-01 events, 2-decimal monetary doubles, midnight date-timestamps);
- FK integrity (lineitem -> orders/part/supplier, orders -> customer,
  nation -> region) and monotone (event_id, ts) ordering in events.

And deliberately stresses what the driver fixture does not:

- TIES: duplicated o_totalprice within a customer (same day), duplicated
  l_extendedprice, duplicated c_acctbal, duplicate (user_id, ts) event
  pairs — any query whose determinism silently depends on "no ties in
  the draw" breaks here, on one engine or the other.
- SKEW: one customer holds ~10% of orders, one user ~15% of events, one
  hot part — exercises the skew/salting paths non-vacuously.
- DUPLICATES: ~2.5% exact-duplicate documents, near-duplicate families
  (1-2 token edits), one 4-member family, token-permutation pairs (same
  unigram multiset, different shingles); embeddings with exact-duplicate
  and 1e-3-perturbed near-duplicate vectors.
- STRUCTURE: a few customers with zero orders (anti-join direction the
  driver fixture never exercises: there every customer has orders), a
  single-event user, a 30-event burst inside two minutes, same-day
  shipments (offset 0).

The sweep over this fixture is a *generalization* gate: both engines see
the same parquet, so any Spark-vs-DuckDB mismatch it finds is a genuine
correctness bug, not fixture noise.

Usage: python scripts/gen_altfixture.py [--out /tmp/altdata/alt1]
                                        [--seed 4242] [--scale 1.0]
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "de", "zh", "fr", "es"]
SEGMENTS = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["P", "O", "F"]
RETURNFLAGS = ["A", "N", "R"]
LINESTATUSES = ["O", "F"]
EVENT_TYPES = ["error", "view", "signup", "click", "purchase"]
P_ADJ = ["cold", "small", "large", "blue", "hot", "new", "old", "red"]
P_NOUN = ["widget", "bolt", "rod", "ring", "anvil", "gear", "gizmo", "plate"]
P_TYPES = ["LARGE", "STANDARD", "ECONOMY", "MEDIUM", "SMALL", "PROMO"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]

DAY_US = 86_400_000_000
EPOCH_1995 = np.datetime64("1995-01-01", "us").astype("int64")

#: Round-11 adversarial-text axis (VERDICT r11 ask #3a).  Every token is
#: valid UTF-8 and space-free; the point is tokenization/casefold/length
#: PARITY — Spark (Java regex/UTF8String) and DuckDB (RE2/utf8proc) see
#: the same bytes and must produce the same answer.
ADV_TOKENS = [
    # >= 40-char tokens: the reference strcpy's into char[40] with no
    # length check (map_reduce.cpp:169, SURVEY §1.2) — our engine must
    # treat length as unbounded, not an input assumption.
    "x" * 39, "y" * 40, "z" * 64, "longtoken" * 14,
    # accents / mixed scripts (Latin-ext, Greek, Cyrillic, CJK, Hangul)
    "café", "naïve", "élan", "über", "straße", "STRASSE", "Łódź",
    "δεδομένα", "ΔΕΔΟΜΕΝΑ", "Σίσυφος", "ΟΔΟΣ",
    "данные", "ДАННЫЕ", "Москва",
    "数据", "数据处理系统", "日本語テキスト", "한국어",
    # Turkish dotted/dotless i and capital sharp s (casefold probes)
    "İstanbul", "ıspanak", "DİYARBAKIR", "ẞHARP",
    # astral-plane code point (UTF-16 surrogate pair on the JVM)
    "𝕏ray",
    # Unicode punctuation — outside Java \p{Punct} and RE2 [[:punct:]]
    # (both ASCII classes), so neither engine may strip it
    "«quoted»", "“smart”", "—dash—", "…ellipsis…", "¡hola!", "¿qué?",
    "。終わり", "【括弧】", "halb–geviert", "ID‑42",
    # ASCII punctuation in unusual shapes
    "a-b_c", "x.y.z", "semi;colon", "(paren)", "quote's",
    "42", "3.14159", "0xDEADBEEF",
]

#: Separator pool for adversarial text: mostly plain spaces, plus tab /
#: newline / runs (all \s in Java AND RE2) and NBSP / ideographic space
#: (NOT \s in either — they glue two tokens into one on BOTH engines;
#: any engine disagreement on that is exactly the bug the axis hunts).
ADV_SEPS = [" "] * 12 + ["\t", "\n", "  ", "\u00a0", "\u3000", " \t "]

#: set by gen(): tables written with zero rows / columns forced all-NULL
#: (round-11 degenerate-input audit, VERDICT r11 ask #4).
_EMPTY_TABLES: set = set()
_NULL_COLUMNS: set = set()

#: round-12 axis: EVERY table exactly ONE row (the degenerate
#: cardinality between the round-11 empty axis and a normal draw).
#: One group everywhere, n-1 == 0 in every variance denominator,
#: self-joins of a 1-row table, LIMIT k > n, windows with no
#: predecessor rows, a corpus whose vocabulary is one document.
_SINGLE_ROW: bool = False

#: FK columns re-pointed at the single surviving parent key (all key
#: columns are arange, so row 0 of every parent holds key 0) — keeps
#: referential integrity under the single-row slice.
_SINGLE_ROW_FK_ZERO = {
    "nation": ("n_regionkey",),
    "customer": ("c_nationkey",),
    "supplier": ("s_nationkey",),
    "orders": ("o_custkey",),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
}

#: round-11 second-wave axis F (total ties): every value-bearing column
#: becomes ONE constant (in-domain).  Maximum tie density: any query
#: whose determinism silently leans on value ordering — top-k, window
#: rank, quantiles, min/max argmax — must get its order from key
#: tiebreaks alone or break here; zero-variance guards (the r10
#: zscore/agg_stats class) are exercised on EVERY group at once.
_TIE_TOTAL: bool = False


def _money(rng: np.random.RandomState, lo: float, hi: float, n: int,
           scale: float = 1.0) -> np.ndarray:
    """Two-decimal doubles, the fixture's monetary representation.

    ``scale`` is the round-11 int64-edge axis (VERDICT r11 ask #3b): at
    1e6 the largest column (o_totalprice) reaches ~5e11 — still inside
    the engine's documented DECIMAL(14,2) money envelope (12 integer
    digits, relational.py:44) but 6 orders beyond any driver draw, so
    cents-scaled int64 sums (~1e17) and decimal triple products
    (~3e21 into DECIMAL(38,6)) are exercised near their headroom.
    np.round(x, 2) at 1e11 magnitude is still exact-2-decimal: double
    spacing there is ~2e-5, far below the 0.01 grid."""
    if _TIE_TOTAL:
        # one in-domain constant per column (consume one draw so the
        # stream position — and thus every OTHER column — matches the
        # normal fixture for the same seed)
        rng.uniform(lo * scale, hi * scale, n)
        return np.full(n, np.round((lo + hi) / 2.0 * scale, 2))
    return np.round(rng.uniform(lo * scale, hi * scale, n), 2)


def _write(out: str, name: str, schema: pa.Schema, cols: dict) -> None:
    table = pa.Table.from_pydict(cols, schema=schema)
    if name in _EMPTY_TABLES:
        table = table.slice(0, 0)
    elif _SINGLE_ROW:
        table = table.slice(0, 1)
        for fk in _SINGLE_ROW_FK_ZERO.get(name, ()):
            i = table.schema.get_field_index(fk)
            table = table.set_column(
                i, table.schema.field(i),
                pa.array([0], table.schema.field(i).type))
    for i, field in enumerate(table.schema):
        if f"{name}.{field.name}" in _NULL_COLUMNS:
            table = table.set_column(
                i, field, pa.nulls(table.num_rows, field.type))
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows"
          + (" (EMPTY axis)" if name in _EMPTY_TABLES else "")
          + (" (SINGLE-ROW axis)" if _SINGLE_ROW else ""))


def gen(out: str, seed: int, scale: float,
        events_start: str = "2024-01-01", money_scale: float = 1.0,
        text_mode: str = "normal", empty_tables: tuple = (),
        null_columns: tuple = (), dup_mode: str = "normal",
        tie_mode: str = "normal", time_mode: str = "normal",
        skew_mode: str = "normal", rows_mode: str = "normal",
        gap_scale: float = 1.0, doc_mode: str = "normal",
        mega_tokens: int = 100_000) -> None:
    global _EMPTY_TABLES, _NULL_COLUMNS, _TIE_TOTAL, _SINGLE_ROW
    _EMPTY_TABLES = set(empty_tables)
    _NULL_COLUMNS = set(null_columns)
    _TIE_TOTAL = tie_mode == "total"
    _SINGLE_ROW = rows_mode == "single"
    frozen_time = time_mode == "frozen"
    ms = money_scale
    os.makedirs(out, exist_ok=True)
    rng = np.random.RandomState(seed)
    events_epoch = np.datetime64(events_start, "us").astype("int64")
    n_cust = max(50, int(400 * scale))
    n_supp = max(10, int(20 * scale))
    n_part = max(100, int(500 * scale))
    n_orders = max(500, int(5000 * scale))
    n_events = max(500, int(3000 * scale))
    n_docs = max(200, int(800 * scale))
    n_vecs = max(200, int(800 * scale))
    n_users = max(10, int(40 * scale))

    _write(out, "region",
           pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]),
           {"r_regionkey": np.arange(5, dtype=np.int32), "r_name": REGIONS})

    _write(out, "nation",
           pa.schema([("n_nationkey", pa.int32()), ("n_name", pa.string()),
                      ("n_regionkey", pa.int32())]),
           {"n_nationkey": np.arange(25, dtype=np.int32),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": rng.randint(0, 5, 25).astype(np.int32)})

    # --- customer: duplicated acctbals (ties) --------------------------------
    acct = _money(rng, -900.0, 9999.0, n_cust, ms)
    acct[1] = acct[0]  # exact acctbal tie
    acct[3] = acct[2]
    _write(out, "customer",
           pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string()),
                      ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
                      ("c_mktsegment", pa.string())]),
           {"c_custkey": np.arange(n_cust, dtype=np.int64),
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": rng.randint(0, 25, n_cust).astype(np.int32),
            "c_acctbal": acct,
            "c_mktsegment": [SEGMENTS[i] for i in rng.randint(0, 5, n_cust)]})

    _write(out, "supplier",
           pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string()),
                      ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64())]),
           {"s_suppkey": np.arange(n_supp, dtype=np.int64),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
            "s_nationkey": rng.randint(0, 25, n_supp).astype(np.int32),
            "s_acctbal": _money(rng, 500.0, 6100.0, n_supp, ms)})

    _write(out, "part",
           pa.schema([("p_partkey", pa.int64()), ("p_name", pa.string()),
                      ("p_brand", pa.string()), ("p_type", pa.string()),
                      ("p_size", pa.int32()), ("p_retailprice", pa.float64())]),
           {"p_partkey": np.arange(n_part, dtype=np.int64),
            "p_name": [f"{P_ADJ[a]} {P_NOUN[b]}"
                       for a, b in zip(rng.randint(0, 8, n_part),
                                       rng.randint(0, 8, n_part))],
            "p_brand": [f"Brand#{i + 1}" for i in rng.randint(0, 25, n_part)],
            "p_type": [P_TYPES[i] for i in rng.randint(0, 6, n_part)],
            "p_size": (np.full(n_part, 25, dtype=np.int32) if _TIE_TOTAL
                       else rng.randint(1, 51, n_part).astype(np.int32)),
            "p_retailprice": (np.full(n_part, np.round(900.0 * ms, 2))
                              if _TIE_TOTAL else
                              np.round((900.0 + 0.1 * np.arange(n_part)) * ms, 2))})

    # --- orders: hot customer (~10%), no-order customers, totalprice ties ----
    no_order_custs = set(rng.choice(n_cust, 5, replace=False).tolist())
    eligible = np.array([c for c in range(n_cust) if c not in no_order_custs])
    hot_cust = int(eligible[0])
    hot_frac = 0.90 if skew_mode in ("extreme", "bimodal") else 0.10
    custkeys = np.where(
        rng.uniform(size=n_orders) < hot_frac, hot_cust,
        eligible[rng.randint(0, len(eligible), n_orders)]).astype(np.int64)
    if skew_mode == "bimodal":
        # split the hot mass across TWO keys (~45% each): the salting
        # and bounded-self-join recipes have only ever seen ONE
        custkeys = np.where(
            (custkeys == hot_cust) & (rng.uniform(size=n_orders) < 0.5),
            int(eligible[1]), custkeys)
    odate_days = rng.randint(0, 2404, n_orders)  # 1995-01-01 .. 2001-08-01
    if frozen_time:
        # axis G: every order on ONE in-range date — a single
        # date_trunc month/quarter group, empty seasonal lag joins,
        # zero-length cohort ages, every as-of/window time tiebreak hit
        odate_days = np.full(n_orders, 500)      # 1996-05-15
    odates = EPOCH_1995 + odate_days * DAY_US
    totalprice = _money(rng, 900.0, 500000.0, n_orders, ms)
    # tie cluster on the hot customer: same totalprice AND same day
    hot_rows = np.flatnonzero(custkeys == hot_cust)[:4]
    totalprice[hot_rows] = totalprice[hot_rows[0]]
    odates[hot_rows] = odates[hot_rows[0]]
    _write(out, "orders",
           pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                      ("o_orderstatus", pa.string()),
                      ("o_totalprice", pa.float64()),
                      ("o_orderdate", pa.timestamp("us")),
                      ("o_orderpriority", pa.string())]),
           {"o_orderkey": np.arange(n_orders, dtype=np.int64),
            "o_custkey": custkeys,
            "o_orderstatus": [STATUSES[i] for i in rng.randint(0, 3, n_orders)],
            "o_totalprice": totalprice,
            "o_orderdate": odates.astype("datetime64[us]"),
            "o_orderpriority": [PRIORITIES[i]
                                for i in rng.randint(0, 5, n_orders)]})

    # --- lineitem: hot part, extendedprice ties, same-day shipments ----------
    lines_per_order = rng.randint(1, 13, n_orders)
    okeys = np.repeat(np.arange(n_orders, dtype=np.int64), lines_per_order)
    n_li = len(okeys)
    hot_part = int(rng.randint(0, n_part))
    part_frac = 0.90 if skew_mode in ("extreme", "bimodal") else 0.08
    partkeys = np.where(rng.uniform(size=n_li) < part_frac, hot_part,
                        rng.randint(0, n_part, n_li)).astype(np.int64)
    if skew_mode == "bimodal":
        partkeys = np.where(
            (partkeys == hot_part) & (rng.uniform(size=n_li) < 0.5),
            (hot_part + 1) % n_part, partkeys)
    extprice = _money(rng, 900.0, 105000.0, n_li, ms)
    extprice[1::97] = extprice[0]  # scattered exact price ties
    shipdates = (np.repeat(odates, lines_per_order)
                 + rng.randint(0, 123, n_li) * DAY_US)
    shipdates[0::50] = np.repeat(odates, lines_per_order)[0::50]  # same-day
    if frozen_time:
        shipdates = np.repeat(odates, lines_per_order)  # ALL same-day
    _write(out, "lineitem",
           pa.schema([("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
                      ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
                      ("l_quantity", pa.float64()),
                      ("l_extendedprice", pa.float64()),
                      ("l_discount", pa.float64()), ("l_tax", pa.float64()),
                      ("l_returnflag", pa.string()),
                      ("l_linestatus", pa.string()),
                      ("l_shipdate", pa.timestamp("us"))]),
           {"l_orderkey": okeys,
            "l_partkey": partkeys,
            "l_suppkey": rng.randint(0, n_supp, n_li).astype(np.int64),
            "l_linenumber": rng.randint(1, 8, n_li).astype(np.int32),
            "l_quantity": (np.full(n_li, 25.0) if _TIE_TOTAL else
                           rng.randint(1, 51 if ms == 1.0 else 1_000_001, n_li).astype(np.float64)),
            "l_extendedprice": extprice,
            "l_discount": (np.full(n_li, 0.05) if _TIE_TOTAL else
                           np.round(rng.randint(0, 11, n_li) / 100.0, 2)),
            "l_tax": (np.full(n_li, 0.04) if _TIE_TOTAL else
                      np.round(rng.randint(0, 9, n_li) / 100.0, 2)),
            "l_returnflag": [RETURNFLAGS[i] for i in rng.randint(0, 3, n_li)],
            "l_linestatus": [LINESTATUSES[i] for i in rng.randint(0, 2, n_li)],
            "l_shipdate": shipdates.astype("datetime64[us]")})

    # --- events: hot user, burst, duplicate timestamps, single-event user ----
    gaps = rng.exponential(15 * 60e6 * gap_scale, n_events)  # ~15 min mean
    gaps[100:130] = 4e6                          # 30-event burst, ~2 minutes
    gaps[1::83] = 0.0                            # exact duplicate timestamps
    if frozen_time:
        # axis G: EVERY event at one microsecond — one tumbling/session
        # window holding the whole table, all-simultaneous concurrency
        # intervals, as-of-nearest fully tied, resample of a single
        # instant, zero session gaps
        gaps = np.zeros(n_events)
    ts = (events_epoch + np.cumsum(gaps)).astype("int64")
    lone_user = n_users - 1
    users = np.where(
        rng.uniform(size=n_events)
        < (0.90 if skew_mode in ("extreme", "bimodal") else 0.15), 0,
        rng.randint(1, n_users - 1, n_events)).astype(np.int64)
    if skew_mode == "bimodal":
        users = np.where(
            (users == 0) & (rng.uniform(size=n_events) < 0.5), 1, users)
    users[n_events // 2] = lone_user  # exactly one event for this user
    _write(out, "events",
           pa.schema([("event_id", pa.int64()), ("ts", pa.timestamp("us")),
                      ("user_id", pa.int64()), ("event_type", pa.string()),
                      ("value", pa.float64()), ("props", pa.string())]),
           {"event_id": np.arange(n_events, dtype=np.int64),
            "ts": ts.astype("datetime64[us]"),
            "user_id": users,
            "event_type": [EVENT_TYPES[i] for i in rng.randint(0, 5, n_events)],
            "value": _money(rng, 0.01, 330.0, n_events, ms),
            "props": [f'{{"k": {k}}}' for k in
                      (np.full(n_events, 50) if _TIE_TOTAL else
                       rng.randint(0, 100, n_events))]})

    # --- documents: dup/near-dup families, permutations ----------------------
    texts = []
    if text_mode == "adversarial":
        # VERDICT r11 ask #3a: Unicode/long-token/pathological-whitespace
        # text.  ~70% driver vocab keeps dedup/TF-IDF paths non-vacuous;
        # the rest draws from ADV_TOKENS; separators from ADV_SEPS.
        pool = VOCAB * 3 + ADV_TOKENS
        for _ in range(n_docs):
            n_tok = rng.randint(10, 100)
            toks = [pool[i] for i in rng.randint(0, len(pool), n_tok)]
            parts = [toks[0]]
            for t in toks[1:]:
                parts.append(ADV_SEPS[rng.randint(0, len(ADV_SEPS))])
                parts.append(t)
            txt = "".join(parts)
            if rng.uniform() < 0.05:
                txt = " " + txt               # leading whitespace
            if rng.uniform() < 0.05:
                txt = txt + "\t"              # trailing whitespace
            texts.append(txt)
        texts[7] = ""                         # empty document
        texts[11] = " \t\n "                  # whitespace-only document
        # (both sit inside the exact-dup injection range below, so each
        # also gains an exact-duplicate partner — degenerate dup pairs)
    else:
        for _ in range(n_docs):
            n_tok = rng.randint(10, 100)
            texts.append(" ".join(VOCAB[i] for i in rng.randint(0, len(VOCAB), n_tok)))
    n_inject = n_docs // 40
    for i in range(n_inject):                      # exact duplicates
        texts[n_docs - 1 - i] = texts[i]
    for i in range(n_inject):                      # 1-2 token near-duplicates
        toks = texts[n_inject + i].split(" ")
        for _ in range(rng.randint(1, 3)):
            toks[rng.randint(0, len(toks))] = VOCAB[rng.randint(0, len(VOCAB))]
        texts[n_docs - n_inject - 1 - i] = " ".join(toks)
    fam = texts[2 * n_inject].split(" ")           # one 4-member family
    for j in range(3):
        v = list(fam)
        v[rng.randint(0, len(v))] = VOCAB[rng.randint(0, len(VOCAB))]
        texts[n_docs - 2 * n_inject - 1 - j] = " ".join(v)
    for i in range(5):                             # permutations: same unigram
        toks = texts[3 * n_inject + i].split(" ")  # multiset, new shingles
        rng.shuffle(toks)
        texts[n_docs - 3 * n_inject - 1 - i] = " ".join(toks)
    if dup_mode == "extreme":
        # round-11 axis E: the WHOLE corpus drawn from 8 distinct
        # contents — 6 unrelated bases, one 1-token near-dup of base 0,
        # one permutation of base 1 (same unigram multiset).  Giant
        # ~n/8-member duplicate clusters: alternating-star CC at high
        # multiplicity, every LSH band bucket saturated, PPJoin prefix
        # pruning degenerate (identical token sets everywhere), keep/drop
        # must pick ONE representative per ~100-member family.
        pool = list(texts[:6])
        nd = texts[0].split(" ")
        nd[len(nd) // 2] = VOCAB[(VOCAB.index(nd[len(nd) // 2]) + 1)
                                 % len(VOCAB)] if nd[len(nd) // 2] in VOCAB \
            else VOCAB[0]
        pool.append(" ".join(nd))
        perm = texts[1].split(" ")
        rng.shuffle(perm)
        pool.append(" ".join(perm))
        draw = rng.randint(0, len(pool), n_docs)
        draw[:len(pool)] = np.arange(len(pool))   # every member present
        texts = [pool[i] for i in draw]
    if doc_mode == "megadoc":
        # round-15 axis (VERDICT r14 ask #6): per-DOCUMENT fan-out skew
        # — one mega_tokens-token document (plus a 1-token
        # near-duplicate of it, so near-dup verification must ship two
        # mega-shingle arrays to one candidate pair) against a corpus
        # of 10-100 token docs.  Every doc_id-keyed shuffle (shingle
        # build, per-doc textstats aggs) gets a ~mega/50× hot key, and
        # the PPJoin length/prefix prunes face a pathological outlier.
        # (Default 100k tokens = the engine-side audit axis; the CI
        # oracle subset uses a smaller mega because several DuckDB
        # truth spellings are super-linear in the outlier's length —
        # see tests/test_altfixture.py MEGADOC_SUBSET.)
        mega = [VOCAB[i] for i in rng.randint(0, len(VOCAB), mega_tokens)]
        mid = n_docs // 2
        texts[mid] = " ".join(mega)
        near = list(mega)
        near[mega_tokens // 2] = VOCAB[rng.randint(0, len(VOCAB))]
        texts[mid + 1] = " ".join(near)
    _write(out, "documents",
           pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                      ("lang", pa.string()), ("source", pa.string()),
                      ("n_chars", pa.int64())]),
           {"doc_id": np.arange(n_docs, dtype=np.int64),
            "text": texts,
            "lang": [LANGS[i] for i in rng.randint(0, 5, n_docs)],
            "source": [f"src{i}" for i in rng.randint(0, 20, n_docs)],
            "n_chars": (np.full(n_docs, 300, dtype=np.int64) if _TIE_TOTAL
                        else rng.randint(47, 559, n_docs).astype(np.int64))})

    # --- embeddings: 10 clusters, exact-dup + near-dup vectors ---------------
    centers = rng.normal(0.0, 0.12, (10, 64))
    labels = rng.randint(0, 10, n_vecs).astype(np.int32)
    vecs = centers[labels] + rng.normal(0.0, 0.05, (n_vecs, 64))
    vecs[n_vecs - 1] = vecs[0]                     # exact duplicate pair
    vecs[n_vecs - 2] = vecs[1]
    labels[n_vecs - 1] = labels[0]
    labels[n_vecs - 2] = labels[1]
    for j in range(3):                             # 1e-3-perturbed near-dups
        vecs[n_vecs - 3 - j] = vecs[2 + j] + rng.normal(0.0, 1e-3, 64)
        labels[n_vecs - 3 - j] = labels[2 + j]
    if dup_mode == "extreme":
        # axis E on vectors: 8 distinct embeddings (incl. one 1e-3
        # near-dup pair) replicated ~n/8× — kNN distances massively
        # tied, IVF/LSH buckets collapse to 8 points, recall harness
        # ground truth saturated
        pool_v = vecs[:8].copy()
        pool_v[7] = pool_v[0] + rng.normal(0.0, 1e-3, 64)
        pool_l = labels[:8].copy()
        pool_l[7] = pool_l[0]
        draw_v = rng.randint(0, 8, n_vecs)
        draw_v[:8] = np.arange(8)
        vecs = pool_v[draw_v]
        labels = pool_l[draw_v]
    _write(out, "embeddings",
           pa.schema([("vec_id", pa.int64()),
                      ("embedding", pa.list_(pa.float32())),
                      ("label", pa.int32())]),
           {"vec_id": np.arange(n_vecs, dtype=np.int64),
            "embedding": [v.astype(np.float32) for v in vecs],
            "label": labels})


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/altdata/alt1")
    ap.add_argument("--seed", type=int, default=4242)
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--events-start", default="2024-01-01",
                    help="events timeline start date — e.g. 2024-02-15 "
                         "spans the Feb-29 leap day and a month boundary, "
                         "stressing calendar-sensitive queries")
    ap.add_argument("--money-scale", type=float, default=1.0,
                    help="multiply all money domains and widen quantities "
                         "to 1..1e6 — 1e6 puts o_totalprice at ~5e11, the "
                         "int64-edge axis (still inside DECIMAL(14,2))")
    ap.add_argument("--text-mode", choices=["normal", "adversarial"],
                    default="normal",
                    help="adversarial = Unicode scripts/punctuation, "
                         ">=40-char tokens, NBSP/ideographic-space glue, "
                         "empty + whitespace-only documents")
    ap.add_argument("--empty-tables", default="",
                    help="comma list of tables to write with ZERO rows "
                         "(degenerate-input audit), e.g. lineitem,events")
    ap.add_argument("--null-columns", default="",
                    help="comma list of table.column to force all-NULL, "
                         "e.g. customer.c_acctbal,events.value")
    ap.add_argument("--dup-mode", choices=["normal", "extreme"],
                    default="normal",
                    help="extreme = documents drawn from 8 distinct texts "
                         "and embeddings from 8 distinct vectors — giant "
                         "~n/8-member dup clusters, saturated LSH buckets, "
                         "massively tied kNN distances")
    ap.add_argument("--tie-mode", choices=["normal", "total"],
                    default="normal",
                    help="total = every value-bearing column one in-domain "
                         "constant (prices, quantities, discounts, acctbal, "
                         "event values, sizes, n_chars) — maximum tie "
                         "density for ordering/top-k/rank tiebreaks and "
                         "zero-variance guards on every group")
    ap.add_argument("--skew-mode", choices=["normal", "extreme", "bimodal"],
                    default="normal",
                    help="extreme = ~90%% of orders on ONE customer, ~90%% "
                         "of lineitems on ONE part, ~90%% of events on ONE "
                         "user -- the salting/bounded-self-join stress; "
                         "also a perf axis (single-key shuffle partitions). "
                         "bimodal = the same 90%% hot mass split across "
                         "TWO keys (~45%% each)")
    ap.add_argument("--gap-scale", type=float, default=1.0,
                    help="multiply event inter-arrival gaps (axis P: "
                         "100 = the same event count stretched over a "
                         "~100x longer timeline -- long-span sparse "
                         "time; stresses resample grids, session "
                         "horizons, as-of distances, window spans)")
    ap.add_argument("--rows-mode", choices=["normal", "single"],
                    default="normal",
                    help="single = every table exactly ONE row (FKs "
                         "re-pointed at the surviving key 0) -- the "
                         "degenerate cardinality between the empty axis "
                         "and a normal draw: one group everywhere, "
                         "n-1 == 0 variance denominators, 1-row "
                         "self-joins, LIMIT k > n")
    ap.add_argument("--time-mode", choices=["normal", "frozen"],
                    default="normal",
                    help="frozen = every event at ONE microsecond, every "
                         "order on ONE date, all shipments same-day — "
                         "degenerates every time window, session, as-of, "
                         "lag/lead and interval-overlap path at once")
    ap.add_argument("--doc-mode", choices=["normal", "megadoc"],
                    default="normal",
                    help="megadoc = one ~100k-token document plus a "
                         "1-token near-duplicate of it (round-15 "
                         "per-doc fan-out skew axis: doc_id-keyed "
                         "shuffles get a ~2000x hot key; near-dup "
                         "verify ships two 100k-shingle arrays to one "
                         "pair)")
    ap.add_argument("--mega-tokens", type=int, default=100_000,
                    help="token length of the megadoc (smaller values "
                         "keep the naive DuckDB truth spellings "
                         "feasible for oracle-compared subsets)")
    a = ap.parse_args()
    empties = tuple(t for t in a.empty_tables.split(",") if t)
    nulls = tuple(c for c in a.null_columns.split(",") if c)
    print(f"generating alt fixture: out={a.out} seed={a.seed} "
          f"scale={a.scale} events_start={a.events_start} "
          f"money_scale={a.money_scale} text_mode={a.text_mode} "
          f"empty={empties} nulls={nulls} dup_mode={a.dup_mode} "
          f"tie_mode={a.tie_mode} time_mode={a.time_mode} "
          f"skew_mode={a.skew_mode} rows_mode={a.rows_mode} "
          f"gap_scale={a.gap_scale} doc_mode={a.doc_mode}")
    gen(a.out, a.seed, a.scale, a.events_start, a.money_scale,
        a.text_mode, empties, nulls, a.dup_mode, a.tie_mode, a.time_mode,
        a.skew_mode, a.rows_mode, a.gap_scale, a.doc_mode, a.mega_tokens)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
