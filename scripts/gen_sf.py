#!/usr/bin/env python3
"""Generate sf1-class benchmark data shaped like /root/testdata/sf0.1.

Tooling only (never imported by the engine): the driver's testdata stops
at sf0.1 (~600k lineitem rows), so scaling evidence beyond it needs a
local generator that reproduces the same schemas, value domains, and
distributions at 10x. Every distribution below was probed from the
sf0.1 tables (see SURVEY.md round-14 notes):

  region/nation   fixed 5 / 25 rows (scale-free dimensions)
  customer        Customer#%09d, nationkey U(0..24), acctbal U(-1000,10000),
                  mktsegment U{5 segments}
  supplier        same pattern, 1/15th of customer
  part            "adj noun" over 8x8 word lists, Brand#1..25, 6 types,
                  size U(1..50), retailprice 900 + (key % 1000)/10
  orders          custkey U, status U{O,P,F}, totalprice U(1000,500000),
                  orderdate U{days 1995-01-01..2001-08-01}, priority U{5}
  lineitem        orderkey U(orders) then sorted (=> per-order line count
                  ~Poisson(4), ~1.8% of orders empty, linenumber = rank),
                  quantity U{1..50}, extendedprice U(900,105000),
                  discount U{0,0.01..0.10}, tax U{0..0.08},
                  returnflag U{A,N,R}, linestatus U{F,O},
                  shipdate U{days 1995-01-02..2001-11-04}
  events          ts sorted-U over 2024-01-01..31 (micros), event_id =
                  rank, user U(10 users/k rows), type U{5}, value Exp(50),
                  props '{"k": %d}' with k U(0..99)
  documents       10..100 words U (the probed sf0.1 length histogram) over
                  a 12,030-token ZIPFIAN vocabulary (s=1.07; the 30 sf0.1
                  theme words head the ranks, then 12k syllable-composed
                  forms) — harder than the driver's own 30-word uniform
                  text: ~hundreds of thousands of distinct shingles, skewed
                  shingle frequencies, non-trivially separable languages.
                  Each doc's tokens are marker-substituted at the probed
                  ~6.6% rate from ITS OWN language's stopword list (en/es/
                  de = the engine's langMarkers; fr = le/et/est/...; zh
                  none -> 'unk'), so langId has real signal instead of the
                  sf0.1 accident where only en markers ever occur. 5% of
                  docs are near-dup copies of an earlier doc via TOKEN-
                  LEVEL EDITS (each token resampled with p=0.04, then one
                  token dropped and one appended with p=0.5 each — Jaccard
                  ~0.75..0.95 vs the source, not a trailing ' dup' marker
                  that leaves every shingle but one intact). lang weighted
                  {en .41, de/es/fr/zh ~.1475}; source round-robin over 20
  embeddings      64-dim float32, 10 labels, per-label Gaussian centroid
                  (sigma .02) + N(0, .1235) noise (matches the observed
                  overall element sigma .125); 10% of rows draw 2.5x noise
                  (heavy tail) and 2% are relabeled uniformly (label noise)
                  so ANN/clustering evidence isn't on perfectly separable
                  spheres

Counts scale 10x from sf0.1 except embeddings, which follow the
testdata's own 0.01->0.1 growth factor of 4x (500 -> 2000 -> 8000).

Usage: python3 scripts/gen_sf.py [outdir] [scale]
  outdir  default data/sf1
  scale   multiplier relative to sf1 (1.0 => 6M lineitem rows)
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "data/sf1"
SCALE = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
rng = np.random.default_rng(42)
os.makedirs(OUT, exist_ok=True)

N_CUST = int(150_000 * SCALE)
N_SUPP = int(10_000 * SCALE)
N_PART = int(200_000 * SCALE)
N_ORD = int(1_500_000 * SCALE)
N_LI = int(6_000_000 * SCALE)
N_EV = int(1_000_000 * SCALE)
N_USERS = int(15_000 * SCALE)
N_DOC = int(50_000 * SCALE)
N_EMB = int(8_000 * SCALE)

DAY_US = 86_400_000_000


def day_us(date):
    return np.datetime64(date, "us").astype(np.int64)


def ts_col(micros):
    return pa.array(micros, type=pa.timestamp("us"))


def write(name, table, row_group_size):
    pq.write_table(table, f"{OUT}/{name}.parquet",
                   row_group_size=row_group_size, compression="snappy")
    print(f"{name}: {table.num_rows} rows")


# ---- scale-free dimensions -------------------------------------------------
write("region", pa.table({
    "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
    "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
}), 1 << 20)

write("nation", pa.table({
    "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
    "n_name": [f"NATION_{i}" for i in range(25)],
    "n_regionkey": pa.array(np.arange(25, dtype=np.int32) % 5),
}), 1 << 20)

# ---- customer / supplier / part --------------------------------------------
write("customer", pa.table({
    "c_custkey": np.arange(N_CUST, dtype=np.int64),
    "c_name": [f"Customer#{i:09d}" for i in range(N_CUST)],
    "c_nationkey": rng.integers(0, 25, N_CUST).astype(np.int32),
    "c_acctbal": np.round(rng.uniform(-1000, 10000, N_CUST), 2),
    "c_mktsegment": np.array(
        ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    )[rng.integers(0, 5, N_CUST)],
}), 1 << 19)

write("supplier", pa.table({
    "s_suppkey": np.arange(N_SUPP, dtype=np.int64),
    "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPP)],
    "s_nationkey": rng.integers(0, 25, N_SUPP).astype(np.int32),
    "s_acctbal": np.round(rng.uniform(-1000, 10000, N_SUPP), 2),
}), 1 << 19)

ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
pkeys = np.arange(N_PART, dtype=np.int64)
write("part", pa.table({
    "p_partkey": pkeys,
    "p_name": [f"{ADJS[a]} {NOUNS[b]}" for a, b in zip(
        rng.integers(0, 8, N_PART), rng.integers(0, 8, N_PART))],
    "p_brand": np.char.add("Brand#", rng.integers(1, 26, N_PART).astype(str)),
    "p_type": np.array(
        ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
    )[rng.integers(0, 6, N_PART)],
    "p_size": rng.integers(1, 51, N_PART).astype(np.int32),
    "p_retailprice": 900.0 + (pkeys % 1000) / 10.0,
}), 1 << 19)

# ---- orders / lineitem -----------------------------------------------------
od_start, od_end = day_us("1995-01-01"), day_us("2001-08-01")
odate = rng.integers(od_start // DAY_US, od_end // DAY_US + 1, N_ORD) * DAY_US
write("orders", pa.table({
    "o_orderkey": np.arange(N_ORD, dtype=np.int64),
    "o_custkey": rng.integers(0, N_CUST, N_ORD),
    "o_orderstatus": np.array(["O", "P", "F"])[rng.integers(0, 3, N_ORD)],
    "o_totalprice": np.round(rng.uniform(1000, 500000, N_ORD), 2),
    "o_orderdate": ts_col(odate),
    "o_orderpriority": np.array(
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    )[rng.integers(0, 5, N_ORD)],
}), 1 << 19)

lok = np.sort(rng.integers(0, N_ORD, N_LI))
# rank within each equal-orderkey run of the sorted array
lnum = (np.arange(N_LI) - np.searchsorted(lok, lok, side="left") + 1)
sd_start, sd_end = day_us("1995-01-02"), day_us("2001-11-04")
sdate = rng.integers(sd_start // DAY_US, sd_end // DAY_US + 1, N_LI) * DAY_US
write("lineitem", pa.table({
    "l_orderkey": lok,
    "l_partkey": rng.integers(0, N_PART, N_LI),
    "l_suppkey": rng.integers(0, N_SUPP, N_LI),
    "l_linenumber": lnum.astype(np.int32),
    "l_quantity": rng.integers(1, 51, N_LI).astype(np.float64),
    "l_extendedprice": np.round(rng.uniform(900, 105000, N_LI), 2),
    "l_discount": rng.integers(0, 11, N_LI) / 100.0,
    "l_tax": rng.integers(0, 9, N_LI) / 100.0,
    "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, N_LI)],
    "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, N_LI)],
    "l_shipdate": ts_col(sdate),
}), 1 << 19)

# ---- events ----------------------------------------------------------------
ev_start = day_us("2024-01-01")
ev_end = day_us("2024-01-31")
ets = np.sort(rng.integers(ev_start, ev_end, N_EV))
write("events", pa.table({
    "event_id": np.arange(N_EV, dtype=np.int64),
    "ts": ts_col(ets),
    "user_id": rng.integers(0, N_USERS, N_EV),
    "event_type": np.array(
        ["click", "error", "purchase", "signup", "view"]
    )[rng.integers(0, 5, N_EV)],
    "value": rng.exponential(50.0, N_EV),
    "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, N_EV)],
}), 1 << 17)

# ---- documents -------------------------------------------------------------
# Zipfian vocabulary: the 30 sf0.1 theme words head the rank order, then
# 12,000 syllable-composed forms ("kazorlin", "velmuta", ...) — ~12k
# distinct tokens with a realistic frequency skew, so shingle cardinality
# and hash-bucket load look like text, not like a 30-symbol alphabet.
THEME = ["spark", "window", "merge", "table", "column", "vector", "stream",
         "value", "data", "small", "join", "filter", "big", "group", "hash",
         "customer", "sort", "order", "slow", "line", "part", "fast", "the",
         "row", "agg", "key", "query", "a", "scan", "batch"]
SYL = ["ka", "zo", "lin", "vel", "mu", "ta", "ri", "don", "fe", "gor",
       "hi", "jun", "lo", "pex", "qua", "sen", "tir", "ub", "wem", "yx"]
SYNTH = [SYL[i % 20] + SYL[(i // 20) % 20] + SYL[(i // 400) % 20] + str(i % 3)
         for i in range(12_000)]
VOCAB = np.array(THEME + SYNTH)
ZIPF_S = 1.07
zipf_p = 1.0 / np.arange(1, len(VOCAB) + 1) ** ZIPF_S
zipf_p /= zipf_p.sum()

# Per-language stopword markers, substituted in at the rate probed from
# sf0.1 (~6.6% of tokens hit a marker regex there). en/es/de are the
# engine's langMarkers lists verbatim; fr is a distinct realistic set (its
# "en" form collides with the es list — genuine cross-lang ambiguity); zh
# gets no Latin markers, so langId reads those docs as 'unk'.
MARKERS = {
    "en": np.array(["the", "a", "of", "and", "to", "in", "is"]),
    "es": np.array(["el", "la", "de", "que", "y", "en", "los"]),
    "de": np.array(["der", "die", "und", "das", "ist", "von"]),
    "fr": np.array(["le", "et", "est", "en", "un", "une"]),
    "zh": None,
}
MARKER_RATE = 0.066

langs = np.array(["en", "de", "es", "fr", "zh"])[
    rng.choice(5, N_DOC, p=[0.41, 0.1475, 0.1475, 0.1475, 0.1475])]
nwords = rng.integers(10, 101, N_DOC)
bounds = np.concatenate([[0], np.cumsum(nwords)])
flat = VOCAB[rng.choice(len(VOCAB), bounds[-1], p=zipf_p)]
# vectorized marker substitution: each token position flips to a marker
# from ITS doc's language list with p = MARKER_RATE
doc_lang_flat = np.repeat(langs, nwords)
sub_mask = rng.random(bounds[-1]) < MARKER_RATE
for lg, mk in MARKERS.items():
    if mk is None:
        continue
    m = sub_mask & (doc_lang_flat == lg)
    flat[m] = mk[rng.integers(0, len(mk), int(m.sum()))]
texts = [" ".join(flat[bounds[i]:bounds[i + 1]]) for i in range(N_DOC)]

# 5% planted near-dups via TOKEN-LEVEL EDITS of an earlier doc: resample
# each token with p=0.04, then drop the first token with p=0.5 and append
# a random token with p=0.5 — Jaccard lands ~0.75..0.95 against the
# source (a suffix marker would leave every shingle but one intact, which
# is trivially easy for MinHash/LSH and measures nothing).
for i in rng.choice(np.arange(1, N_DOC), size=N_DOC // 20, replace=False):
    toks = texts[rng.integers(0, i)].split(" ")
    edit = rng.random(len(toks)) < 0.04
    toks = [VOCAB[rng.choice(len(VOCAB), p=zipf_p)] if e else t
            for t, e in zip(toks, edit)]
    if rng.random() < 0.5 and len(toks) > 10:
        toks = toks[1:]
    if rng.random() < 0.5:
        toks.append(VOCAB[rng.choice(len(VOCAB), p=zipf_p)])
    texts[i] = " ".join(toks)
write("documents", pa.table({
    "doc_id": np.arange(N_DOC, dtype=np.int64),
    "text": texts,
    "lang": langs,
    "source": [f"src{i % 20}" for i in range(N_DOC)],
    "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
}), 1 << 16)

# ---- embeddings ------------------------------------------------------------
labels = rng.integers(0, 10, N_EMB)
centroids = rng.normal(0, 0.02, (10, 64))
noise = rng.normal(0, 0.1235, (N_EMB, 64))
# heavy tail: 10% of rows at 2.5x noise; label noise: 2% relabeled
heavy = rng.random(N_EMB) < 0.10
noise[heavy] *= 2.5
flip = rng.random(N_EMB) < 0.02
labels[flip] = rng.integers(0, 10, int(flip.sum()))
vecs = (centroids[labels] + noise).astype(np.float32)
write("embeddings", pa.table({
    "vec_id": np.arange(N_EMB, dtype=np.int64),
    "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
    "label": labels.astype(np.int32),
}), 1 << 16)

print(f"done -> {OUT}")
