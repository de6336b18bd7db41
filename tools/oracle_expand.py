#!/usr/bin/env python3
"""Expansion-law oracle for the clone-replica scale rungs: computes EXACT
DuckDB-oracle answers for the 6 recursive/graph queries whose pairwise CTEs
are single-node infeasible at high clone multiplicity, by

  1. running the quadratic part (ngram-Jaccard pairs -> recursive CC) on
     the BASE corpus only (feasible),
  2. expanding it with the clone algebra ScaleUp guarantees (replica i =
     byte-identical text under doc_id + i*KeyOffset):
       - identical text => identical token-hash array => identical shingle
         set => a base pair (a,b), jaccard>=0.5, lifts to ALL f^2 clone
         combinations at the SAME jaccard; every shingle-bearing doc's f
         clones pair mutually at jaccard exactly 1.0; NO other pairs exist
         (a cross pair of non-paired base docs would imply the base pair).
       - hence components expand 1:1 (families are cliques, cross edges
         mirror base edges, distinct base components cannot merge), and
         min-id labels are preserved (replica 0 keeps the base ids):
         cc_scaled = { (doc + i*K, lab) : (doc,lab) in cc_base, i<f }
                   U { (doc + i*K, doc) : doc shingle-bearing, not in
                       cc_base, i<f }   (singletons become f-cliques)
  3. running each query's verbatim LINEAR tail over the expanded cc frame
     against the scaled directory's real tables.

q_pagerank expands the same way at the ARITHMETIC level: every clone of u
has identical rank by symmetry, deg'(u_i) = f*deg(u) + (f-1), n' = f*|b|,
and the oracle's exact scaled-integer recurrence restricted to base nodes:
    r0 = S // n'
    r_{k+1}(v) = (15*S) // (100*n')
               + (85 * ((f-1)*(r_k(v) // deg'(v))
                        + f * sum_{u in N(v)} r_k(u) // deg'(u))) // 100
computed in exact Python ints over the base edge list.

--selfcheck f: builds a documents-only x f clone dir from the base via the
same key-offset rule, runs the ORIGINAL quadratic oracles there, and
compares them against the expansion prediction — validating the law with
DuckDB alone (no Spark output involved) before it is applied at a rung
where the original is infeasible.

Usage:
  python3 tools/oracle_expand.py --selfcheck 5 <baseDir> <verifyOutDir>
  python3 tools/oracle_expand.py <baseDir> <scaledDir> <factor> <verifyOutDir>

<verifyOutDir> needs oracle_sql.json; per-query Spark dumps (<out>/<q>/)
are compared when present, else the oracle result is saved for later.
Developer tooling only — the engine itself is the Scala library.
"""
import atexit, json, os, shutil, sys, tempfile, time
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_oracle import rows_match, view_select

KEY_OFFSET = 10000000  # graft.ScaleUp.KeyOffset
S = 1000000000000      # pagerank fixed-point scale (oracle literal)

CC_MARKER = ("cc AS (SELECT node AS doc_id, min(lab) AS cluster_id\n"
             "  FROM walk GROUP BY 1)")
C_SEGMENT = ("c AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i\n"
             "  FROM e a JOIN e b ON a.hsh = b.hsh AND a.doc_id < b.doc_id\n"
             "  GROUP BY 1, 2),\n")
PAIRS_TO_CC = """pairs AS (SELECT c.a_id, c.b_id,
    c.i::DOUBLE / (x.n + y.n - c.i) AS jaccard
  FROM c JOIN n x ON c.a_id = x.doc_id JOIN n y ON c.b_id = y.doc_id
  WHERE c.i::DOUBLE / (x.n + y.n - c.i) >= 0.5),
und AS (SELECT a_id AS u, b_id AS v FROM pairs
  UNION ALL SELECT b_id AS u, a_id AS v FROM pairs),
walk AS (
  SELECT u AS node, u AS lab FROM (SELECT DISTINCT u FROM und) du
  UNION
  SELECT e.v AS node, w.lab FROM walk w JOIN und e ON e.u = w.node),
cc AS (SELECT node AS doc_id, min(lab) AS cluster_id
  FROM walk GROUP BY 1)"""

PAIRS_SEGMENT = """pairs AS (SELECT c.a_id, c.b_id,
    c.i::DOUBLE / (x.n + y.n - c.i) AS jaccard
  FROM c JOIN n x ON c.a_id = x.doc_id JOIN n y ON c.b_id = y.doc_id
  WHERE c.i::DOUBLE / (x.n + y.n - c.i) >= 0.5)"""

CC_QUERIES = ["q_dedup_cluster", "q_dedup_survivor", "q_split_assign",
              "q_source_dup_rate", "q_curation_report"]
# Tails over the raw pair list (no CC): the pair set itself expands
# exactly — cross pairs inherit the base jaccard (identical shingle
# sets => identical two-integer division), within-family pairs sit at
# IEEE-exact 1.0 (i/i), and no other pair exists at >= 0.5.
PAIR_QUERIES = ["q_dedup_ngram", "q_dup_degree", "q_jaccard_hist",
                "q_source_overlap"]
# Chunk-hash mm dedup family: same clone algebra on the chunk-hash SET
# (a pure function of the payload bytes). A base pair (a,b,n_shared)
# lifts to all f^2 clone combinations at the SAME integer n_shared;
# every doc with >= 3 (surviving) distinct chunks pairs with its own
# clones at n_shared = that count; no other pair clears the >= 3 bar
# (it would imply the base pair). The capped twin's fractional hot set
# is clone-INVARIANT by integer arithmetic (df'=f*df, n'=f*n, so
# df'*100 > n' <=> df*100 > n) — no cap-scaling assertion needed.
MM_QUERIES = ["q_mm_dedup", "q_mm_dedup_capped"]
# Banded-LSH / embedding-cosine pair family (added at the x300 rung,
# where these three blow the in-gate timeout on the ~9x pair blowup —
# 300-clone family cliques under list_intersect / dot-product math).
# The FULL original SQL is feasible on the base corpus, and the scaled
# answer is its exact clone lift: minhash signatures / band keys /
# cosine values are pure functions of the clone-invariant payload, so a
# scaled cross pair exists iff its base pair does (identical bands <=>
# identical base bands; cosine identical), carrying identical value
# columns — and the clones of one row pair mutually with self-pair
# values computed exactly as the original SQL computes them (i/i and
# 16/16.0 are IEEE-exact 1.0 and abs(1-1)=0; the embedding self-cosine
# dot(v,v)/(nrm*nrm) is COMPUTED per vector, not assumed 1.0, and the
# >= 0.4 filter applied to it, excluding zero-norm vectors exactly as
# the original pair predicate would).
#   name -> (eligibility SQL producing (id, <value columns...>) for the
#            family cliques, "col TYPE" defs of the value columns)
LIFT_QUERIES = {
    "q_dedup_minhash_pairs": (
        """SELECT doc_id,
                  1.0::DOUBLE AS jaccard
           FROM documents
           WHERE len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                 x -> x <> '')) >= 3""",
        ["jaccard DOUBLE"]),
    "q_minhash_calibration": (
        """SELECT doc_id,
                  16::BIGINT AS n_eq, 1.0::DOUBLE AS est_jaccard,
                  1.0::DOUBLE AS jaccard, 0.0::DOUBLE AS abs_err
           FROM documents
           WHERE len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                 x -> x <> '')) >= 3""",
        ["n_eq BIGINT", "est_jaccard DOUBLE", "jaccard DOUBLE",
         "abs_err DOUBLE"]),
    "q_dedup_embedding": (
        # label IS NOT NULL mirrors the oracle's a.label = b.label join
        # predicate: a NULL-label vector never pairs (NULL = NULL is not
        # true), so its clones must not receive family self-pairs either
        # (Dedup.scala:1367-1373 pins that semantics must not depend on
        # the current corpus having no NULL labels).
        """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                      FROM embeddings),
           n AS (SELECT vec_id, label, v,
                   sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm
                 FROM e)
           SELECT vec_id,
             list_sum(list_transform(v, (x,i) -> x * v[i])) / (nrm*nrm)
               AS cosine
           FROM n
           WHERE label IS NOT NULL
             AND list_sum(list_transform(v, (x,i) -> x * v[i])) / (nrm*nrm)
                 >= 0.4""",
        ["cosine DOUBLE"]),
}
# q_minhash_sweep: the per-threshold confusion-matrix AGGREGATE over the
# same banded-LSH candidate multiset (`cal`) whose pair-level lift is the
# validated q_minhash_calibration law above. Counts are additive over the
# lifted multiset: every base cal pair contributes f^2 copies with
# IDENTICAL (est_jaccard, jaccard) — so its tp/fp/fn classification at
# every threshold is unchanged — and every eligible doc (>= 3 tokens,
# i.e. len(hs) > 0, so the self-pair has u = len(hs) > 0) contributes
# f(f-1)/2 clique self-pairs at est = 16/16.0 and jac = i/i, both
# IEEE-exact 1.0 >= t for all three thresholds — always a tp. Hence
#   tp_f(t) = f^2 * tp_b(t) + E * f(f-1)/2,  fp_f = f^2 * fp_b,
#   fn_f = f^2 * fn_b,
# with prec/rec recomputed by the oracle's own round(.., 6)/nullif
# expressions over the lifted counts.
SWEEP_QUERY = "q_minhash_sweep"
SWEEP_ELIG_COUNT = """SELECT count(*) FROM documents
    WHERE len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                          x -> x <> '')) >= 3"""
# Text/vocab aggregate clone lifts (the ×300 rung's last in-gate holdouts:
# their token explosions put DuckDB's direct run at 450M+ intermediate
# rows under a shared-host memory cap). Each law is exact under the clone
# algebra and runs entirely on the BASE corpus:
#  - per-DOC queries (quality, repetition): every metric is a pure
#    function of the clone-invariant text, so the scaled answer is the
#    base answer fanned out f ways under doc_id + i*K, re-sorted.
#  - q_tfidf_terms groups by SOURCE, which ScaleUp never mutates: at xf,
#    tf' = f*tf while df (distinct sources per token) and ns are
#    UNCHANGED, so the scaled answer is the original SQL with its tf CTE
#    scaled by f — ranks can't flip (all scores scale uniformly,
#    tie-break is tok ASC).
#  - q_vocab_zipf: global counts scale to f*cnt, total to f*total, ranks
#    and ties unchanged (uniform scaling, tok ASC tie-break); share
#    (f*cnt)/(f*total) equals the base ratio within float tolerance.
#  - q_vocab_growth buckets each token's FIRST doc_id into deciles of
#    [0, max(doc_id)]: clones only add HIGHER ids (replica 0 keeps base
#    ids), so first_doc stays the base minimum while mx' = mx +
#    (f-1)*K — the original SQL with the scaled mx substituted. (At x300
#    every base id sits in decile 0 of the 3e9-wide id range: the
#    position-based growth curve degenerates under clone scaling — an
#    artifact of the corpus, reproduced identically by both engines.)
#   name -> (marker that must appear verbatim in the oracle SQL,
#            replacement template with {f}/{mxs} slots, fanout flag)
TEXT_LIFTS = {
    "q_text_quality": (None, None, True),
    "q_text_repetition": (None, None, True),
    "q_tfidf_terms": (
        "tf AS (SELECT source, tok, count(*) AS tf FROM ct GROUP BY 1, 2)",
        "tf AS (SELECT source, tok, count(*) * {f} AS tf FROM ct "
        "GROUP BY 1, 2)", False),
    "q_vocab_zipf": (
        "c AS (SELECT tok, count(*) AS cnt FROM e GROUP BY 1)",
        "c AS (SELECT tok, count(*) * {f} AS cnt FROM e GROUP BY 1)", False),
    "q_vocab_growth": (
        "nd AS (SELECT max(doc_id) AS mx FROM e)",
        "nd AS (SELECT CAST({mxs} AS BIGINT) AS mx FROM (SELECT 1))", False),
}
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def connect(sf_dir):
    con = duckdb.connect()
    con.execute(f"SET threads={os.environ.get('GRAFT_DUCK_THREADS', '8')}")
    # default cap well under DuckDB's 80%-of-RAM: the ×300 prediction
    # fan-outs run concurrently with the Spark dump on the same host
    con.execute(
        f"SET memory_limit='{os.environ.get('GRAFT_DUCK_MEM', '24g')}'")
    # per-pid spill dir, matching check_oracle/expand_compare: a fixed
    # path is unlinked wholesale when any sharing process exits
    con.execute(f"SET temp_directory='/tmp/duck_expand_tmp_{os.getpid()}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if not (os.path.isdir(p) or os.path.exists(p)):
            continue
        con.execute(f"CREATE VIEW {t} AS {view_select(sf_dir, t)}")
    return con


def rewrite_tail(sql):
    """Replace the quadratic pair/CC CTEs with a passthrough of exp_cc,
    keeping the linear CTEs (t/h0/h/b/e/n) the tails still reference."""
    assert C_SEGMENT in sql, "c-segment not found (oracle SQL drifted?)"
    assert PAIRS_TO_CC in sql, "pairs..cc segment not found"
    return (sql.replace(C_SEGMENT, "")
               .replace(PAIRS_TO_CC, "cc AS (SELECT * FROM exp_cc)"))


def rewrite_pair_tail(sql):
    """Same, for the queries whose tail reads the raw pair list."""
    assert C_SEGMENT in sql, "c-segment not found (oracle SQL drifted?)"
    assert PAIRS_SEGMENT in sql, "pairs segment not found"
    return (sql.replace(C_SEGMENT, "")
               .replace(PAIRS_SEGMENT, "pairs AS (SELECT * FROM exp_pairs)"))


def base_cc_and_b(base_dir, oracle):
    """(cc rows, shingle-bearing doc ids) on the base corpus — the only
    quadratic work, done where it is feasible."""
    sql = oracle["q_dedup_cluster"]
    i = sql.find(CC_MARKER)
    assert i >= 0
    prefix = sql[:i + len(CC_MARKER)]
    con = connect(base_dir)
    t0 = time.time()
    cc = con.sql(prefix + "\nSELECT doc_id, cluster_id FROM cc").fetchall()
    bs = [r[0] for r in con.sql(
        prefix + "\nSELECT doc_id FROM b").fetchall()]
    print(f"[expand] base cc: {len(cc)} rows, |b|={len(bs)} "
          f"({time.time()-t0:.0f}s)", flush=True)
    con.close()
    return cc, bs


def base_pairs_rows(base_dir, oracle):
    """Base (a_id, b_id, jaccard) pair list — the quadratic half of the
    pair-shaped queries, computed where it is feasible."""
    sql = oracle["q_dedup_ngram"]
    i = sql.find(PAIRS_SEGMENT)
    assert i >= 0
    con = connect(base_dir)
    t0 = time.time()
    rows = con.sql(sql[:i + len(PAIRS_SEGMENT)]
                   + "\nSELECT a_id, b_id, jaccard FROM pairs").fetchall()
    print(f"[expand] base pairs: {len(rows)} rows ({time.time()-t0:.0f}s)",
          flush=True)
    con.close()
    return rows


def base_fcapped(base_dir, oracle):
    """Base df-FRACTION-capped pair list + the eligibility set (docs with
    >=1 surviving posting). Valid for expansion only when the scaled cap
    equals f x the base cap so the hot shingle sets coincide (asserted by
    the caller): then surviving postings are the base survivors cloned and
    the pair set expands exactly like the uncapped one — within-family
    pairs exist only for docs that keep >=1 posting (the fully-boilerplate
    eligibility edge DedupCollapseSpec pins at x5)."""
    sql = oracle["q_dedup_ngram_fcapped"]
    i = sql.rfind("SELECT c.a_id")
    assert i > 0, "fcapped oracle shape drifted"
    prefix = sql[:i].rstrip().rstrip(",")  # ends after c AS (...)
    con = connect(base_dir)
    t0 = time.time()
    pairs = con.sql(sql).fetchall()  # the full base oracle IS the pair list
    eligible = [r[0] for r in con.sql(
        prefix + "\nSELECT DISTINCT doc_id FROM e").fetchall()]
    nb = con.sql(prefix + "\nSELECT count(*) FROM b").fetchone()[0]
    print(f"[expand] base fcapped pairs: {len(pairs)}, eligible "
          f"{len(eligible)}, |b|={nb} ({time.time()-t0:.0f}s)", flush=True)
    con.close()
    return pairs, eligible, nb


def base_mm(base_dir, oracle, name):
    """Base mm chunk-overlap pair list (the query's own output) + the
    within-family eligibility frame: (doc_id, c) with c = the doc's
    (surviving, for the capped twin) distinct chunk count, c >= 3."""
    sql = oracle[name]
    i = sql.find("SELECT a.doc_id")
    assert i > 0, f"{name} oracle shape drifted"
    prefix = sql[:i].rstrip()
    src = "cf" if name.endswith("_capped") else "ch"
    con = connect(base_dir)
    t0 = time.time()
    pairs = con.sql(sql).fetchall()
    elig = con.sql(
        prefix + f"\nSELECT doc_id, CAST(count(*) AS BIGINT) AS c "
                 f"FROM {src} GROUP BY doc_id HAVING count(*) >= 3").fetchall()
    print(f"[expand] base {name}: {len(pairs)} pairs, {len(elig)} eligible "
          f"({time.time()-t0:.0f}s)", flush=True)
    con.close()
    return pairs, elig


def base_edges(base_dir, oracle):
    """Base und edge list (directed both ways) for the pagerank law."""
    sql = oracle["q_pagerank"]
    i = sql.find("und AS")
    assert i >= 0
    prefix = sql[:i].rstrip().rstrip(",")
    con = connect(base_dir)
    t0 = time.time()
    pairs = con.sql(
        f"{prefix}, fin AS (SELECT 1) SELECT a_id, b_id FROM pairs").fetchall()
    print(f"[expand] base pairs for pagerank: {len(pairs)} "
          f"({time.time()-t0:.0f}s)", flush=True)
    con.close()
    return pairs


def pagerank_expanded(pairs, b_ids, f):
    """Exact integer replica of the oracle's 6 unrolled rounds on the
    f-expanded graph, computed per BASE node (clones are rank-identical by
    symmetry). Returns {base_doc: (deg_expanded, pr_scaled)}."""
    from collections import defaultdict
    nbrs = defaultdict(list)
    for a, b in pairs:
        nbrs[a].append(b)
        nbrs[b].append(a)
    nodes = sorted(b_ids)  # at f>1 every shingle-bearing doc is an und node
    n2 = f * len(nodes)
    degx = {u: f * len(nbrs[u]) + (f - 1) for u in nodes}
    r = {u: S // n2 for u in nodes}
    for _ in range(6):
        contrib = {u: r[u] // degx[u] for u in nodes}
        r = {v: (15 * S) // (100 * n2)
                + (85 * ((f - 1) * contrib[v]
                         + f * sum(contrib[u] for u in nbrs[v]))) // 100
             for v in nodes}
    return {u: (degx[u], r[u]) for u in nodes}


def compare_with_spark(con, name, out_dir, dst):
    spark_dir = f"{out_dir}/{name}"
    # _SUCCESS, not isdir: the dump dir exists as soon as Spark starts
    # committing, so a concurrent still-running Verify would feed a
    # partially committed dump into the compare → spurious FAIL (same
    # r13-ADVICE fix as expand_compare / gate_waves).
    if not os.path.exists(f"{spark_dir}/_SUCCESS"):
        n = con.sql(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"SAVED {name} ({n} rows) — no committed spark dump present",
              flush=True)
        return True
    # lockstep CHUNKED compare (check_oracle's shape): the ×300 rung's
    # pair-family predictions run to 200M+ rows — two fetchall()s of that
    # held simultaneously OOM the gate host.
    want_rel = con.sql(f"SELECT * FROM '{dst}'")
    want_cols = list(want_rel.columns)
    gcur = con.cursor()
    got_rel = gcur.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
    got_cols = list(got_rel.columns)
    if sorted(want_cols) != sorted(got_cols):
        print(f"FAIL {name}: columns {sorted(got_cols)} vs {sorted(want_cols)}",
              flush=True)
        return False
    w_idx = [want_cols.index(c) for c in sorted(want_cols)]
    g_idx = [got_cols.index(c) for c in sorted(got_cols)]
    CHUNK = 200000
    ok, why, n_rows = True, "", 0
    while True:
        want = want_rel.fetchmany(CHUNK)
        got = got_rel.fetchmany(CHUNK)
        if not want and not got:
            break
        if len(want) != len(got):
            ok, why = False, (f"row count differs at offset {n_rows} "
                              f"(+{len(got)} spark vs +{len(want)} oracle)")
            break
        ok, why = rows_match([[r[i] for i in g_idx] for r in got],
                             [[r[i] for i in w_idx] for r in want])
        if not ok:
            why = f"at chunk offset {n_rows}: {why}"
            break
        n_rows += len(want)
    gcur.close()
    print(f"{'ok  ' if ok else 'FAIL'} {name} ({n_rows} rows)"
          + ("" if ok else f": {why}"), flush=True)
    return ok


def run_lifted(con, base_dir, oracle, f, out_dir, save_dir, compare):
    """LIFT_QUERIES: run the ORIGINAL SQL + the eligibility SQL on the
    base corpus, lift cross pairs to all f^2 clone combinations, add the
    per-doc f-cliques with the self-pair value columns, sort, save,
    compare. Returns the all-ok flag."""
    all_ok = True
    bcon = connect(base_dir)
    for name, (elig_sql, val_defs) in LIFT_QUERIES.items():
        if name not in oracle:
            continue
        t0 = time.time()
        rel = bcon.sql(oracle[name])
        cols = list(rel.columns)
        assert cols[0] == "a_id" and cols[1] == "b_id", cols
        base_rows = rel.fetchall()
        elig_rows = bcon.sql(elig_sql).fetchall()
        print(f"[expand] base {name}: {len(base_rows)} pairs, "
              f"{len(elig_rows)} eligible ({time.time()-t0:.0f}s)",
              flush=True)
        names = [d.split()[0] for d in val_defs]
        defs = ", ".join(val_defs)
        marks = ", ".join("?" * (2 + len(names)))
        emarks = ", ".join("?" * (1 + len(names)))
        con.execute(f"CREATE OR REPLACE TABLE lift_base "
                    f"(a_id BIGINT, b_id BIGINT, {defs})")
        con.executemany(f"INSERT INTO lift_base VALUES ({marks})", base_rows)
        con.execute(f"CREATE OR REPLACE TABLE lift_elig (id BIGINT, {defs})")
        con.executemany(f"INSERT INTO lift_elig VALUES ({emarks})", elig_rows)
        vlist = ", ".join(f"p.{v}" for v in names)
        evlist = ", ".join(f"e.{v}" for v in names)
        dst = f"{save_dir}/oracle_{name}.parquet"
        t0 = time.time()
        con.execute(f"""COPY (
          WITH cross_p AS (
            SELECT least(p.a_id + i.range * {KEY_OFFSET},
                         p.b_id + j.range * {KEY_OFFSET}) AS a_id,
                   greatest(p.a_id + i.range * {KEY_OFFSET},
                            p.b_id + j.range * {KEY_OFFSET}) AS b_id,
                   {vlist}
            FROM lift_base p
            CROSS JOIN range({f}) i CROSS JOIN range({f}) j),
          fam AS (
            SELECT e.id + i.range * {KEY_OFFSET} AS a_id,
                   e.id + j.range * {KEY_OFFSET} AS b_id, {evlist}
            FROM lift_elig e
            CROSS JOIN range({f}) i CROSS JOIN range({f}) j
            WHERE i.range < j.range)
          SELECT * FROM (SELECT * FROM cross_p UNION ALL SELECT * FROM fam)
          ORDER BY a_id, b_id) TO '{dst}' (FORMAT PARQUET)""")
        print(f"[expand] {name} predicted in {time.time()-t0:.0f}s",
              flush=True)
        if compare:
            all_ok &= compare_with_spark(con, name, out_dir, dst)
    bcon.close()
    return all_ok


def run_sweep(con, base_dir, oracle, f, out_dir, save_dir, compare):
    """q_minhash_sweep count lift (see SWEEP_QUERY comment). The base
    sweep (the full original aggregate, ~10s at sf0.1) and the eligible-doc
    count run on the base corpus; the lifted counts and the re-derived
    prec/rec are computed in DuckDB with the oracle's own round/nullif."""
    if SWEEP_QUERY not in oracle:
        return True
    bcon = connect(base_dir)
    t0 = time.time()
    base = bcon.sql(oracle[SWEEP_QUERY]).fetchall()  # t, tp, fp, fn, prec, rec
    n_elig = bcon.sql(SWEEP_ELIG_COUNT).fetchone()[0]
    bcon.close()
    print(f"[expand] base {SWEEP_QUERY}: {len(base)} thresholds, "
          f"{n_elig} eligible ({time.time()-t0:.0f}s)", flush=True)
    con.execute("CREATE OR REPLACE TABLE sweep_base "
                "(t DOUBLE, tp BIGINT, fp BIGINT, fn BIGINT)")
    con.executemany("INSERT INTO sweep_base VALUES (?, ?, ?, ?)",
                    [(r[0], r[1], r[2], r[3]) for r in base])
    clique = f * (f - 1) // 2
    dst = f"{save_dir}/oracle_{SWEEP_QUERY}.parquet"
    con.execute(f"""COPY (
      SELECT t, tp, fp, fn,
        round(CAST(tp AS DOUBLE) / nullif(tp + fp, 0), 6) AS prec,
        round(CAST(tp AS DOUBLE) / nullif(tp + fn, 0), 6) AS rec
      FROM (SELECT t, tp * {f} * {f} + {n_elig} * {clique} AS tp,
                   fp * {f} * {f} AS fp, fn * {f} * {f} AS fn
            FROM sweep_base)
      ORDER BY t) TO '{dst}' (FORMAT PARQUET)""")
    if compare:
        return compare_with_spark(con, SWEEP_QUERY, out_dir, dst)
    return True


def run_text_lifts(con, base_dir, oracle, f, out_dir, save_dir, compare):
    """TEXT_LIFTS (see comment at the table): per-doc fan-outs and
    count-scaled rewrites, all computed on the base corpus."""
    all_ok = True
    bcon = connect(base_dir)
    for name, (marker, repl, fanout) in TEXT_LIFTS.items():
        if name not in oracle:
            continue
        sql = oracle[name]
        dst = f"{save_dir}/oracle_{name}.parquet"
        t0 = time.time()
        if fanout:
            base_pq = f"{save_dir}/base_{name}.parquet"
            bcon.execute(f"COPY ({sql}) TO '{base_pq}' (FORMAT PARQUET)")
            cols = [r[0] for r in con.sql(
                f"DESCRIBE SELECT * FROM '{base_pq}'").fetchall()]
            assert cols[0] == "doc_id", f"{name}: lead col {cols[0]}"
            rest = ", ".join(f'b."{c}"' for c in cols[1:])
            con.execute(f"""COPY (
              SELECT b.doc_id + i.range * {KEY_OFFSET} AS doc_id, {rest}
              FROM '{base_pq}' b CROSS JOIN range({f}) i
              ORDER BY doc_id) TO '{dst}' (FORMAT PARQUET)""")
        else:
            assert marker in sql, f"{name} oracle shape drifted"
            if name == "q_vocab_growth":
                i = sql.find(",\nnd AS")
                assert i > 0, "vocab_growth nd CTE not found"
                mx = bcon.sql(sql[:i] + "\nSELECT max(doc_id) AS mx FROM e"
                              ).fetchone()[0]
                new_sql = sql.replace(
                    marker, repl.format(mxs=mx + (f - 1) * KEY_OFFSET))
            else:
                new_sql = sql.replace(marker, repl.format(f=f))
            bcon.execute(f"COPY ({new_sql}) TO '{dst}' (FORMAT PARQUET)")
        print(f"[expand] {name} predicted in {time.time()-t0:.0f}s",
              flush=True)
        if compare:
            all_ok &= compare_with_spark(con, name, out_dir, dst)
    bcon.close()
    return all_ok


def run_expanded(base_dir, scaled_dir, f, out_dir, save_dir=None,
                 compare=True):
    """Predict all 6 oracle answers on the f-expanded corpus; compare with
    Spark dumps under out_dir when present; save parquet under save_dir
    (default out_dir). compare=False (the selfcheck path) skips the Spark
    compare entirely — the dumps under out_dir are for a DIFFERENT scale
    there, and comparing against them would print misleading FAILs."""
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    save_dir = save_dir or out_dir
    cc, bs = base_cc_and_b(base_dir, oracle)
    all_ok = True

    con = connect(scaled_dir)
    con.execute("CREATE TABLE cc_base (doc_id BIGINT, cluster_id BIGINT)")
    con.executemany("INSERT INTO cc_base VALUES (?, ?)", cc)
    con.execute("CREATE TABLE b_base (doc_id BIGINT)")
    con.executemany("INSERT INTO b_base VALUES (?)", [(x,) for x in bs])
    con.execute(f"""CREATE TABLE exp_cc AS
      WITH fam AS (
        SELECT b.doc_id, COALESCE(c.cluster_id, b.doc_id) AS cluster_id
        FROM b_base b LEFT JOIN cc_base c USING (doc_id))
      SELECT fam.doc_id + i.range * {KEY_OFFSET} AS doc_id, fam.cluster_id
      FROM fam CROSS JOIN range({f}) i""")

    pb = base_pairs_rows(base_dir, oracle)
    con.execute(
        "CREATE TABLE pairs_base (a_id BIGINT, b_id BIGINT, jaccard DOUBLE)")
    con.executemany("INSERT INTO pairs_base VALUES (?, ?, ?)", pb)
    con.execute(f"""CREATE TABLE exp_pairs AS
      WITH cross_p AS (
        SELECT least(p.a_id + i.range * {KEY_OFFSET},
                     p.b_id + j.range * {KEY_OFFSET}) AS a_id,
               greatest(p.a_id + i.range * {KEY_OFFSET},
                        p.b_id + j.range * {KEY_OFFSET}) AS b_id,
               p.jaccard
        FROM pairs_base p CROSS JOIN range({f}) i CROSS JOIN range({f}) j),
      fam AS (
        SELECT b.doc_id + i.range * {KEY_OFFSET} AS a_id,
               b.doc_id + j.range * {KEY_OFFSET} AS b_id,
               1.0::DOUBLE AS jaccard
        FROM b_base b CROSS JOIN range({f}) i CROSS JOIN range({f}) j
        WHERE i.range < j.range)
      SELECT * FROM cross_p UNION ALL SELECT * FROM fam""")

    for name in CC_QUERIES + PAIR_QUERIES:
        t0 = time.time()
        sql = (rewrite_tail(oracle[name]) if name in CC_QUERIES
               else rewrite_pair_tail(oracle[name]))
        dst = f"{save_dir}/oracle_{name}.parquet"
        con.execute(f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET)")
        print(f"[expand] {name} predicted in {time.time()-t0:.0f}s", flush=True)
        if compare:
            all_ok &= compare_with_spark(con, name, out_dir, dst)

    # fcapped: valid only when hot sets coincide across the scale-up —
    # scaled df = f x base df (clones), so hot_scaled <=> df > cap_s/f;
    # require cap_s == f * cap_b exactly, then expand like the uncapped
    # pair set but with within-family pairs restricted to ELIGIBLE docs.
    import math, re
    from fractions import Fraction
    m = re.search(r"ceil\(([0-9.]+) \* count\(\*\)\)",
                  oracle["q_dedup_ngram_fcapped"])
    assert m, "fcapped frac literal not found"
    frac = Fraction(m.group(1))
    fp, elig, nb = base_fcapped(base_dir, oracle)
    cap_b = math.ceil(frac * nb)
    cap_s = math.ceil(frac * f * nb)
    assert cap_s == f * cap_b, (
        f"fractional cap does not scale exactly ({cap_s} != {f}*{cap_b}) — "
        "the fcapped expansion law does not apply at this (frac, N, f)")
    con.execute(
        "CREATE TABLE fpairs_base (a_id BIGINT, b_id BIGINT, jaccard DOUBLE)")
    con.executemany("INSERT INTO fpairs_base VALUES (?, ?, ?)", fp)
    con.execute("CREATE TABLE elig_base (doc_id BIGINT)")
    con.executemany("INSERT INTO elig_base VALUES (?)", [(x,) for x in elig])
    dst = f"{save_dir}/oracle_q_dedup_ngram_fcapped.parquet"
    con.execute(f"""COPY (
      WITH cross_p AS (
        SELECT least(p.a_id + i.range * {KEY_OFFSET},
                     p.b_id + j.range * {KEY_OFFSET}) AS a_id,
               greatest(p.a_id + i.range * {KEY_OFFSET},
                        p.b_id + j.range * {KEY_OFFSET}) AS b_id,
               p.jaccard
        FROM fpairs_base p CROSS JOIN range({f}) i CROSS JOIN range({f}) j),
      fam AS (
        SELECT e.doc_id + i.range * {KEY_OFFSET} AS a_id,
               e.doc_id + j.range * {KEY_OFFSET} AS b_id,
               1.0::DOUBLE AS jaccard
        FROM elig_base e CROSS JOIN range({f}) i CROSS JOIN range({f}) j
        WHERE i.range < j.range)
      SELECT * FROM (SELECT * FROM cross_p UNION ALL SELECT * FROM fam)
      ORDER BY a_id, b_id) TO '{dst}' (FORMAT PARQUET)""")
    if compare:
        all_ok &= compare_with_spark(con, "q_dedup_ngram_fcapped", out_dir, dst)

    # mm chunk-hash dedup family: pair lift + eligibility fan-out
    for name in MM_QUERIES:
        if name not in oracle:
            continue
        pairs, elig = base_mm(base_dir, oracle, name)
        con.execute("CREATE OR REPLACE TABLE mmp "
                    "(a_id BIGINT, b_id BIGINT, n_shared BIGINT)")
        con.executemany("INSERT INTO mmp VALUES (?, ?, ?)", pairs)
        con.execute("CREATE OR REPLACE TABLE mme (doc_id BIGINT, c BIGINT)")
        con.executemany("INSERT INTO mme VALUES (?, ?)", elig)
        dst = f"{save_dir}/oracle_{name}.parquet"
        t0 = time.time()
        con.execute(f"""COPY (
          WITH cross_p AS (
            SELECT least(p.a_id + i.range * {KEY_OFFSET},
                         p.b_id + j.range * {KEY_OFFSET}) AS a_id,
                   greatest(p.a_id + i.range * {KEY_OFFSET},
                            p.b_id + j.range * {KEY_OFFSET}) AS b_id,
                   p.n_shared
            FROM mmp p CROSS JOIN range({f}) i CROSS JOIN range({f}) j),
          fam AS (
            SELECT e.doc_id + i.range * {KEY_OFFSET} AS a_id,
                   e.doc_id + j.range * {KEY_OFFSET} AS b_id,
                   e.c AS n_shared
            FROM mme e CROSS JOIN range({f}) i CROSS JOIN range({f}) j
            WHERE i.range < j.range)
          SELECT * FROM (SELECT * FROM cross_p UNION ALL SELECT * FROM fam)
          ORDER BY a_id, b_id) TO '{dst}' (FORMAT PARQUET)""")
        print(f"[expand] {name} predicted in {time.time()-t0:.0f}s", flush=True)
        if compare:
            all_ok &= compare_with_spark(con, name, out_dir, dst)

    # banded-LSH / embedding-cosine pair family (x300 in-gate timeouts)
    all_ok &= run_lifted(con, base_dir, oracle, f, out_dir, save_dir,
                         compare)

    # minhash-sweep confusion-matrix count lift (x300 in-gate timeout)
    all_ok &= run_sweep(con, base_dir, oracle, f, out_dir, save_dir,
                        compare)

    # text/vocab aggregate lifts (x300 in-gate memory holdouts)
    all_ok &= run_text_lifts(con, base_dir, oracle, f, out_dir, save_dir,
                             compare)

    # q_interval_join: the join predicate is DATE-only (shipdate within
    # [orderdate, orderdate+30d]) with no key equality, and ScaleUp never
    # mutates dates — so EVERY lineitem replica matches EVERY order
    # replica: n_shipped'(o_i) = f * n_shipped(o), including the left-join
    # zeros (f*0). The o_orderkey % 100 = 0 filter survives cloning
    # because KeyOffset % 100 == 0 (asserted). The base answer is the
    # whole quadratic part; the lift is a single fan-out.
    if "q_interval_join" in oracle:
        assert KEY_OFFSET % 100 == 0, "interval-join law needs K % 100 == 0"
        bcon = connect(base_dir)
        t0 = time.time()
        ij = bcon.sql(oracle["q_interval_join"]).fetchall()
        bcon.close()
        print(f"[expand] base q_interval_join: {len(ij)} rows "
              f"({time.time()-t0:.0f}s)", flush=True)
        con.execute("CREATE OR REPLACE TABLE ij_base "
                    "(o_orderkey BIGINT, n_shipped BIGINT)")
        con.executemany("INSERT INTO ij_base VALUES (?, ?)", ij)
        dst = f"{save_dir}/oracle_q_interval_join.parquet"
        con.execute(f"""COPY (
          SELECT b.o_orderkey + i.range * {KEY_OFFSET} AS o_orderkey,
                 b.n_shipped * {f} AS n_shipped
          FROM ij_base b CROSS JOIN range({f}) i
          ORDER BY o_orderkey) TO '{dst}' (FORMAT PARQUET)""")
        if compare:
            all_ok &= compare_with_spark(con, "q_interval_join", out_dir, dst)

    # pagerank: exact integer recurrence on the base graph, fanned out
    pr = pagerank_expanded(base_edges(base_dir, oracle), bs, f)
    con.execute(
        "CREATE TABLE pr_base (doc_id BIGINT, deg BIGINT, pr_scaled BIGINT)")
    con.executemany("INSERT INTO pr_base VALUES (?, ?, ?)",
                    [(u, d, r) for u, (d, r) in pr.items()])
    dst = f"{save_dir}/oracle_q_pagerank.parquet"
    con.execute(f"""COPY (
      SELECT p.doc_id + i.range * {KEY_OFFSET} AS doc_id, p.deg, p.pr_scaled
      FROM pr_base p CROSS JOIN range({f}) i
      ORDER BY pr_scaled DESC, doc_id) TO '{dst}' (FORMAT PARQUET)""")
    if compare:
        all_ok &= compare_with_spark(con, "q_pagerank", out_dir, dst)
    con.close()
    return all_ok


# ---------------------------------------------------------------------------
# Zipf (per-entity multiplicity) generalization — round 16.
#
# ScaleUp's SCALEUP_ZIPF=1 rung gives base doc d a clone multiplicity m_d
# (clamp(round(A/rank),1,cap)), not a uniform f. The clone algebra still
# holds pointwise — clones are byte-identical payloads under
# doc_id + i*KEY_OFFSET, i < m_d — so every uniform law generalizes by
# replacing "f copies" with "m_d copies":
#   - a base pair (a,b) lifts to m_a * m_b scaled pairs at the same value
#     columns; a doc's clones pair mutually in C(m_d, 2) cliques;
#   - UNLIKE uniform f>=2, a doc with m_d = 1 and no base pair has NO
#     edges in the scaled graph: it is absent from pairs/und/cc entirely
#     (under uniform scaling every b-doc self-cliques into the graph);
#   - the df-FRACTION-capped family is NOT clone-invariant under Zipf:
#     scaled df(h) = sum(m_d : d contains h) and the cap is
#     ceil(frac * sum(m_d : d in b)) — the hot set must be recomputed
#     with m-weighted counts (still on the BASE corpus: postings are
#     linear, only the final pair join is quadratic, and that runs over
#     base-sized surviving postings);
#   - pagerank: all clones of u are rank-identical by symmetry (identical
#     neighborhoods: the m_u - 1 family clones plus every clone of every
#     base neighbor), so the exact integer recurrence runs per BASE node:
#       n'      = sum(m_u : u a scaled-graph node)
#       deg'(u) = (m_u - 1) + sum(m_v : v in N(u))
#       r_{k+1}(v) = (15S)//(100 n')
#                  + (85*((m_v - 1)*c_k(v) + sum(m_u * c_k(u)))) // 100,
#       c_k(u) = r_k(u) // deg'(u),
#     over nodes {u in b : m_u >= 2 or N(u) nonempty}.
#
# The multiplicity map is NOT taken on trust from the generator: it is
# read off the SCALED corpus itself (m_d = count of clones of base id d =
# rows with doc_id % KEY_OFFSET = d), so the laws bind to what is actually
# on disk. --zipf-selfcheck validates the whole family DuckDB-only, like
# the uniform --selfcheck: clone documents under a genuine Zipf map (same
# clamp(round(A/rank),1,cap) shape ScaleUp uses, including m=1 tails),
# run the ORIGINAL quadratic SQL there, compare with the prediction.
# ---------------------------------------------------------------------------

ZIPF_DOC_QUERIES = (CC_QUERIES + PAIR_QUERIES
                    + ["q_dedup_ngram_fcapped", "q_pagerank"])


def doc_mult(con_scaled):
    """Per-base-doc clone multiplicity read off the scaled documents table.
    Returns (dict base_doc_id -> m, max_m)."""
    rows = con_scaled.sql(
        f"SELECT doc_id % {KEY_OFFSET} AS base_id, count(*) AS m, "
        f"       count(DISTINCT doc_id // {KEY_OFFSET}) AS mdist "
        f"FROM documents GROUP BY 1").fetchall()
    m = {}
    for base_id, cnt, mdist in rows:
        # one row per doc per replica: count == distinct offsets, offsets
        # must be 0..m-1 (ScaleUp's rule) for the +i*K lift to be exact
        assert cnt == mdist, f"doc {base_id}: {cnt} rows, {mdist} offsets"
        m[base_id] = cnt
    mx = con_scaled.sql(
        f"SELECT max(doc_id // {KEY_OFFSET}) + 1, min(doc_id % {KEY_OFFSET}),"
        f" max(doc_id % {KEY_OFFSET}) FROM documents").fetchone()
    assert mx[2] < KEY_OFFSET
    print(f"[zipf] multiplicity map: {len(m)} base docs, max m "
          f"{max(m.values())}, total {sum(m.values())}", flush=True)
    return m, max(m.values())


def mult_table(con, m):
    con.execute("CREATE OR REPLACE TABLE mult (doc_id BIGINT, m BIGINT)")
    con.executemany("INSERT INTO mult VALUES (?, ?)", list(m.items()))


def base_fcapped_zipf(base_dir, oracle, m):
    """m-WEIGHTED fcapped base frame: the scaled hot set is
    {h : sum(m_d : d contains h) > ceil(frac * sum(m_d : d in b))} — not
    the base hot set (Zipf breaks the uniform df'=f*df invariance). Splice
    the m-weighted cap/hot into the ORIGINAL SQL's linear prefix, keep its
    verbatim e/n/c/pair tail, and return (pairs, eligible docs)."""
    sql = oracle["q_dedup_ngram_fcapped"]
    i0 = sql.find("cap AS (")
    i1 = sql.find("e AS (SELECT * FROM e0 WHERE hsh NOT IN")
    assert 0 < i0 < i1, "fcapped oracle shape drifted (zipf splice)"
    spliced = (
        sql[:i0]
        + "cap AS (SELECT CAST(ceil(" + _fcapped_frac(sql) + " * "
        + "(SELECT sum(mu.m) FROM b JOIN mult mu USING (doc_id)))"
        + " AS BIGINT) AS maxdf),\n"
        + "hot AS (SELECT e0.hsh FROM e0 JOIN mult mu USING (doc_id)\n"
        + "  GROUP BY 1 HAVING sum(mu.m) > (SELECT maxdf FROM cap)),\n"
        + sql[i1:])
    i2 = spliced.rfind("SELECT c.a_id")
    assert i2 > 0
    prefix = spliced[:i2].rstrip().rstrip(",")
    con = connect(base_dir)
    mult_table(con, m)
    t0 = time.time()
    pairs = con.sql(spliced).fetchall()
    eligible = [r[0] for r in con.sql(
        prefix + "\nSELECT DISTINCT doc_id FROM e").fetchall()]
    print(f"[zipf] base fcapped (m-weighted hot set): {len(pairs)} pairs, "
          f"{len(eligible)} eligible ({time.time()-t0:.0f}s)", flush=True)
    con.close()
    return pairs, eligible


def _fcapped_frac(sql):
    import re
    mm = re.search(r"ceil\(([0-9.]+) \* count\(\*\)\)", sql)
    assert mm, "fcapped frac literal not found"
    return mm.group(1)


def pagerank_expanded_zipf(pairs, b_ids, m):
    """Exact integer replica of the oracle's 6 unrolled rounds on the
    m-expanded graph, per BASE node. A doc with m=1 and no base pair is
    NOT a graph node (no clique, no cross edge)."""
    from collections import defaultdict
    nbrs = defaultdict(list)
    for a, b in pairs:
        nbrs[a].append(b)
        nbrs[b].append(a)
    nodes = sorted(u for u in b_ids if m[u] >= 2 or nbrs[u])
    n2 = sum(m[u] for u in nodes)
    degx = {u: (m[u] - 1) + sum(m[v] for v in nbrs[u]) for u in nodes}
    r = {u: S // n2 for u in nodes}
    for _ in range(6):
        contrib = {u: r[u] // degx[u] for u in nodes}
        r = {v: (15 * S) // (100 * n2)
                + (85 * ((m[v] - 1) * contrib[v]
                         + sum(m[u] * contrib[u] for u in nbrs[v]))) // 100
             for v in nodes}
    return {u: (degx[u], r[u]) for u in nodes}


def run_expanded_zipf(base_dir, scaled_dir, out_dir, save_dir=None,
                      compare=True):
    """Predict the 11 quadratic-family oracle answers on a Zipf-multiplicity
    clone corpus; compare with Spark dumps under out_dir when present."""
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    save_dir = save_dir or out_dir
    con = connect(scaled_dir)
    m, maxm = doc_mult(con)
    mult_table(con, m)
    cc, bs = base_cc_and_b(base_dir, oracle)
    all_ok = True

    con.execute("CREATE OR REPLACE TABLE cc_base "
                "(doc_id BIGINT, cluster_id BIGINT)")
    con.executemany("INSERT INTO cc_base VALUES (?, ?)", cc)
    con.execute("CREATE OR REPLACE TABLE b_base (doc_id BIGINT)")
    con.executemany("INSERT INTO b_base VALUES (?)", [(x,) for x in bs])
    # scaled cc: paired docs keep their base component label (components
    # expand 1:1, min-id labels preserved: replica 0 keeps base ids);
    # unpaired docs enter ONLY as m>=2 family cliques labeled by base id
    con.execute(f"""CREATE OR REPLACE TABLE exp_cc AS
      WITH fam AS (
        SELECT b.doc_id, c.cluster_id AS base_lab
        FROM b_base b LEFT JOIN cc_base c USING (doc_id))
      SELECT fam.doc_id + i.range * {KEY_OFFSET} AS doc_id,
             COALESCE(fam.base_lab, fam.doc_id) AS cluster_id
      FROM fam JOIN mult mu USING (doc_id)
      JOIN range({maxm}) i ON i.range < mu.m
      WHERE fam.base_lab IS NOT NULL OR mu.m >= 2""")

    pb = base_pairs_rows(base_dir, oracle)
    con.execute("CREATE OR REPLACE TABLE pairs_base "
                "(a_id BIGINT, b_id BIGINT, jaccard DOUBLE)")
    con.executemany("INSERT INTO pairs_base VALUES (?, ?, ?)", pb)
    con.execute(f"""CREATE OR REPLACE TABLE exp_pairs AS
      WITH cross_p AS (
        SELECT least(p.a_id + i.range * {KEY_OFFSET},
                     p.b_id + j.range * {KEY_OFFSET}) AS a_id,
               greatest(p.a_id + i.range * {KEY_OFFSET},
                        p.b_id + j.range * {KEY_OFFSET}) AS b_id,
               p.jaccard
        FROM pairs_base p
        JOIN mult ma ON ma.doc_id = p.a_id
        JOIN mult mb ON mb.doc_id = p.b_id
        JOIN range({maxm}) i ON i.range < ma.m
        JOIN range({maxm}) j ON j.range < mb.m),
      fam AS (
        SELECT b.doc_id + i.range * {KEY_OFFSET} AS a_id,
               b.doc_id + j.range * {KEY_OFFSET} AS b_id,
               1.0::DOUBLE AS jaccard
        FROM b_base b JOIN mult mu USING (doc_id)
        JOIN range({maxm}) i ON i.range < mu.m
        JOIN range({maxm}) j ON j.range < mu.m
        WHERE i.range < j.range)
      SELECT * FROM cross_p UNION ALL SELECT * FROM fam""")

    for name in CC_QUERIES + PAIR_QUERIES:
        t0 = time.time()
        sql = (rewrite_tail(oracle[name]) if name in CC_QUERIES
               else rewrite_pair_tail(oracle[name]))
        dst = f"{save_dir}/oracle_{name}.parquet"
        con.execute(f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET)")
        print(f"[zipf] {name} predicted in {time.time()-t0:.0f}s", flush=True)
        if compare:
            all_ok &= compare_with_spark(con, name, out_dir, dst)

    # fcapped: m-weighted hot set recomputed on the base corpus
    fp, elig = base_fcapped_zipf(base_dir, oracle, m)
    con.execute("CREATE OR REPLACE TABLE fpairs_base "
                "(a_id BIGINT, b_id BIGINT, jaccard DOUBLE)")
    con.executemany("INSERT INTO fpairs_base VALUES (?, ?, ?)", fp)
    con.execute("CREATE OR REPLACE TABLE elig_base (doc_id BIGINT)")
    con.executemany("INSERT INTO elig_base VALUES (?)",
                    [(x,) for x in elig])
    dst = f"{save_dir}/oracle_q_dedup_ngram_fcapped.parquet"
    con.execute(f"""COPY (
      WITH cross_p AS (
        SELECT least(p.a_id + i.range * {KEY_OFFSET},
                     p.b_id + j.range * {KEY_OFFSET}) AS a_id,
               greatest(p.a_id + i.range * {KEY_OFFSET},
                        p.b_id + j.range * {KEY_OFFSET}) AS b_id,
               p.jaccard
        FROM fpairs_base p
        JOIN mult ma ON ma.doc_id = p.a_id
        JOIN mult mb ON mb.doc_id = p.b_id
        JOIN range({maxm}) i ON i.range < ma.m
        JOIN range({maxm}) j ON j.range < mb.m),
      fam AS (
        SELECT e.doc_id + i.range * {KEY_OFFSET} AS a_id,
               e.doc_id + j.range * {KEY_OFFSET} AS b_id,
               1.0::DOUBLE AS jaccard
        FROM elig_base e JOIN mult mu USING (doc_id)
        JOIN range({maxm}) i ON i.range < mu.m
        JOIN range({maxm}) j ON j.range < mu.m
        WHERE i.range < j.range)
      SELECT * FROM (SELECT * FROM cross_p UNION ALL SELECT * FROM fam)
      ORDER BY a_id, b_id) TO '{dst}' (FORMAT PARQUET)""")
    if compare:
        all_ok &= compare_with_spark(
            con, "q_dedup_ngram_fcapped", out_dir, dst)

    # pagerank: per-node-multiplicity integer recurrence, fanned out by m
    pr = pagerank_expanded_zipf(base_edges(base_dir, oracle), bs, m)
    con.execute("CREATE OR REPLACE TABLE pr_base "
                "(doc_id BIGINT, deg BIGINT, pr_scaled BIGINT)")
    con.executemany("INSERT INTO pr_base VALUES (?, ?, ?)",
                    [(u, d, r) for u, (d, r) in pr.items()])
    dst = f"{save_dir}/oracle_q_pagerank.parquet"
    con.execute(f"""COPY (
      SELECT p.doc_id + i.range * {KEY_OFFSET} AS doc_id, p.deg, p.pr_scaled
      FROM pr_base p JOIN mult mu USING (doc_id)
      JOIN range({maxm}) i ON i.range < mu.m
      ORDER BY pr_scaled DESC, doc_id) TO '{dst}' (FORMAT PARQUET)""")
    if compare:
        all_ok &= compare_with_spark(con, "q_pagerank", out_dir, dst)
    con.close()
    return all_ok


def zipf_selfcheck(base_dir, factor, cap, out_dir):
    """Validate the per-entity-multiplicity laws with DuckDB alone: clone
    documents under a GENUINE Zipf map (ScaleUp's clamp(round(A/rank),1,
    cap) shape, solved for factor*N total rows, including m=1 tail docs),
    run the ORIGINAL quadratic SQL on the clone dir, compare with the
    prediction."""
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    tmp = tempfile.mkdtemp(prefix="graft-zipfcheck-")
    try:
        con0 = connect(base_dir)
        ids = [r[0] for r in con0.sql(
            "SELECT doc_id FROM documents ORDER BY doc_id").fetchall()]
        n = len(ids)
        # ScaleUp.solveZipfA, unit weights: binary-search A so the clamped
        # harmonic sum lands on factor*n
        def total(a):
            return sum(min(cap, max(1, round(a / (r + 1))))
                       for r in range(n))
        lo, hi = 1.0, float(cap) * n
        for _ in range(60):
            mid = (lo + hi) / 2
            if total(mid) < factor * n:
                lo = mid
            else:
                hi = mid
        a = (lo + hi) / 2
        m = {ids[r]: min(cap, max(1, round(a / (r + 1)))) for r in range(n)}
        n1 = sum(1 for v in m.values() if v == 1)
        print(f"[zipf-selfcheck] {n} docs, factor {factor}, cap {cap}: "
              f"total {sum(m.values())}, max m {max(m.values())}, "
              f"{n1} docs at m=1", flush=True)
        assert max(m.values()) == cap and n1 > 0, \
            "selfcheck map must exercise both the cap and the m=1 tail"
        mult_table(con0, m)
        con0.execute(f"""COPY (
          SELECT d.* REPLACE (d.doc_id + i.range * {KEY_OFFSET} AS doc_id)
          FROM documents d JOIN mult mu USING (doc_id)
          JOIN range({cap}) i ON i.range < mu.m)
          TO '{tmp}/documents.parquet' (FORMAT PARQUET)""")
        con0.close()
        okall = run_expanded_zipf(base_dir, tmp, out_dir, save_dir=tmp,
                                  compare=False)
        assert okall is not None
        con = connect(tmp)
        ok = True
        for name in ZIPF_DOC_QUERIES:
            t0 = time.time()
            want = con.sql(oracle[name]).fetchall()  # ORIGINAL SQL on clones
            got = con.sql(
                f"SELECT * FROM '{tmp}/oracle_{name}.parquet'").fetchall()
            same, why = rows_match(got, want)
            print(f"{'ok  ' if same else 'FAIL'} zipf-selfcheck {name} "
                  f"({len(want)} rows, original {time.time()-t0:.0f}s)"
                  + ("" if same else f": {why}"), flush=True)
            ok &= same
        con.close()
        return ok
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def selfcheck(base_dir, f, out_dir):
    """Validate the expansion law with DuckDB alone: clone the documents
    table x f under the ScaleUp key rule, run the ORIGINAL quadratic
    oracles there, compare with the expansion prediction."""
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    tmp = tempfile.mkdtemp(prefix="graft-expcheck-")
    try:
        con0 = connect(base_dir)
        con0.execute(f"""COPY (
          SELECT * REPLACE (doc_id + i.range * {KEY_OFFSET} AS doc_id)
          FROM documents CROSS JOIN range({f}) i)
          TO '{tmp}/documents.parquet' (FORMAT PARQUET)""")
        # orders + lineitem clones (primary keys offset, ScaleUp's rule)
        # so the interval-join law's ORIGINAL SQL runs on the clone dir too
        con0.execute(f"""COPY (
          SELECT * REPLACE (o_orderkey + i.range * {KEY_OFFSET} AS o_orderkey)
          FROM orders CROSS JOIN range({f}) i)
          TO '{tmp}/orders.parquet' (FORMAT PARQUET)""")
        con0.execute(f"""COPY (
          SELECT * REPLACE (l_orderkey + i.range * {KEY_OFFSET} AS l_orderkey)
          FROM lineitem CROSS JOIN range({f}) i)
          TO '{tmp}/lineitem.parquet' (FORMAT PARQUET)""")
        # embeddings clone (vec_id offset) so the LIFT_QUERIES cosine
        # law's ORIGINAL SQL runs on the clone dir too
        con0.execute(f"""COPY (
          SELECT * REPLACE (vec_id + i.range * {KEY_OFFSET} AS vec_id)
          FROM embeddings CROSS JOIN range({f}) i)
          TO '{tmp}/embeddings.parquet' (FORMAT PARQUET)""")
        con0.close()
        # predictions land in tmp; originals computed fresh per query
        okall = run_expanded(base_dir, tmp, f, out_dir, save_dir=tmp,
                             compare=False)
        assert okall is not None
        con = connect(tmp)
        ok = True
        for name in (CC_QUERIES + PAIR_QUERIES + MM_QUERIES
                     + list(LIFT_QUERIES) + [SWEEP_QUERY]
                     + list(TEXT_LIFTS)
                     + ["q_dedup_ngram_fcapped", "q_pagerank",
                        "q_interval_join"]):
            t0 = time.time()
            want = con.sql(oracle[name]).fetchall()  # ORIGINAL quadratic SQL
            got = con.sql(
                f"SELECT * FROM '{tmp}/oracle_{name}.parquet'").fetchall()
            same, why = rows_match(got, want)
            print(f"{'ok  ' if same else 'FAIL'} selfcheck {name} "
                  f"({len(want)} rows, original {time.time()-t0:.0f}s)"
                  + ("" if same else f": {why}"), flush=True)
            ok &= same
        con.close()
        return ok
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _docs_clone_selfcheck(base_dir, f, out_dir, names, predict):
    """Shared cheap selfcheck harness: clone documents x f under the
    ScaleUp key rule, run `predict` (writes oracle_<name>.parquet under
    tmp), then run each ORIGINAL SQL on the clone dir and compare."""
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    tmp = tempfile.mkdtemp(prefix="graft-expcheck-")
    try:
        con0 = connect(base_dir)
        con0.execute(f"""COPY (
          SELECT * REPLACE (doc_id + i.range * {KEY_OFFSET} AS doc_id)
          FROM documents CROSS JOIN range({f}) i)
          TO '{tmp}/documents.parquet' (FORMAT PARQUET)""")
        con0.close()
        con = connect(tmp)
        assert predict(con, oracle, tmp)
        ok = True
        for name in names:
            t0 = time.time()
            want = con.sql(oracle[name]).fetchall()  # ORIGINAL SQL on clone
            got = con.sql(
                f"SELECT * FROM '{tmp}/oracle_{name}.parquet'").fetchall()
            same, why = rows_match(got, want)
            print(f"{'ok  ' if same else 'FAIL'} selfcheck {name} "
                  f"({len(want)} rows, original {time.time()-t0:.0f}s)"
                  + ("" if same else f": {why}"), flush=True)
            ok &= same
        con.close()
        return ok
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def sweep_selfcheck(base_dir, f, out_dir):
    """Validate the sweep count lift with DuckDB alone, cheaply (documents
    clone only — no CC/pagerank recomputation, which OOMs at x3)."""
    return _docs_clone_selfcheck(
        base_dir, f, out_dir, [SWEEP_QUERY],
        lambda con, oracle, tmp: run_sweep(con, base_dir, oracle, f,
                                           out_dir, tmp, compare=False))


def textlift_selfcheck(base_dir, f, out_dir):
    """Validate the text/vocab lifts with DuckDB alone (documents clone)."""
    return _docs_clone_selfcheck(
        base_dir, f, out_dir, list(TEXT_LIFTS),
        lambda con, oracle, tmp: run_text_lifts(con, base_dir, oracle, f,
                                                out_dir, tmp, compare=False))


if __name__ == "__main__":
    args = sys.argv[1:]
    # crashed/killed runs must not leak the multi-GB per-pid spill dir
    # (r14 ADVICE): mirror check_oracle's atexit reclaim.
    atexit.register(shutil.rmtree, f"/tmp/duck_expand_tmp_{os.getpid()}",
                    True)
    if args and args[0] == "--sweep-selfcheck":
        f, base_dir, out_dir = int(args[1]), args[2], args[3]
        sys.exit(0 if sweep_selfcheck(base_dir, f, out_dir) else 1)
    if args and args[0] == "--textlift-selfcheck":
        f, base_dir, out_dir = int(args[1]), args[2], args[3]
        sys.exit(0 if textlift_selfcheck(base_dir, f, out_dir) else 1)
    if args and args[0] == "--textlift":
        base_dir, scaled_dir, f, out_dir = (
            args[1], args[2], int(args[3]), args[4])
        con = connect(scaled_dir)
        oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
        sys.exit(0 if run_text_lifts(con, base_dir, oracle, f, out_dir,
                                     out_dir, True) else 1)
    if args and args[0] == "--sweep":
        base_dir, scaled_dir, f, out_dir = (
            args[1], args[2], int(args[3]), args[4])
        con = connect(scaled_dir)
        oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
        sys.exit(0 if run_sweep(con, base_dir, oracle, f, out_dir,
                                out_dir, True) else 1)
    if args and args[0] == "--zipf-selfcheck":
        # oracle_expand.py --zipf-selfcheck <factor> <cap> <base> <out>
        f, cap, base_dir, out_dir = (int(args[1]), int(args[2]), args[3],
                                     args[4])
        sys.exit(0 if zipf_selfcheck(base_dir, f, cap, out_dir) else 1)
    if args and args[0] == "--zipf":
        # Per-entity-multiplicity apply: the map is read off the scaled
        # documents table itself (no factor argument — Zipf rungs have no
        # single f): oracle_expand.py --zipf <base> <scaled> <out>
        base_dir, scaled_dir, out_dir = args[1], args[2], args[3]
        sys.exit(0 if run_expanded_zipf(base_dir, scaled_dir, out_dir)
                 else 1)
    if args and args[0] == "--selfcheck":
        f, base_dir, out_dir = int(args[1]), args[2], args[3]
        sys.exit(0 if selfcheck(base_dir, f, out_dir) else 1)
    if args and args[0] == "--lift":
        # LIFT_QUERIES only — reruns of the banded-LSH/cosine family
        # without redoing the (expensive, already-compared) CC/pair/mm
        # predictions: oracle_expand.py --lift <base> <scaled> <f> <out>
        base_dir, scaled_dir, f, out_dir = (
            args[1], args[2], int(args[3]), args[4])
        con = connect(scaled_dir)
        oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
        sys.exit(0 if run_lifted(con, base_dir, oracle, f, out_dir,
                                 out_dir, True) else 1)
    base_dir, scaled_dir, f, out_dir = args[0], args[1], int(args[2]), args[3]
    sys.exit(0 if run_expanded(base_dir, scaled_dir, f, out_dir) else 1)
