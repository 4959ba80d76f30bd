#!/usr/bin/env python3
"""sf1 (10x probe) check for the recursive-component dedup rows.

The DuckDB oracles for dedup_clusters / dedup_cluster_rep / pipeline_filter
embed a recursive reachability CTE whose intermediate (node, label) set is
sum(m^2) over components — quadratic in the giant near-dup component the
10x corpus seeds, so the SQL oracle is infeasible at sf1 specifically.
This script replaces ONLY that step with a linear union-find over the
simhash pair set (itself DuckDB-verified at sf1 by the --only dedup pass),
then re-derives all three results independently and compares them to the
Spark parquet outputs cell-for-cell.

Usage: python3 scripts/verify_clusters_sf1.py <sfDir> <verifyOutDir>
"""
import glob
import sys

import duckdb


def read(con, pattern):
    return con.execute(
        f"SELECT * FROM read_parquet({glob.glob(pattern)!r})").fetchall()


def components(pairs):
    """Min-root union-find: component id = min node id, like the engine's
    min-label propagation. Single pass over `pairs` (may be a generator —
    the sf3 embedding pair set is 180M rows, streamed in chunks rather
    than materialized as Python tuples)."""
    parent = {}
    seen = set()

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        seen.add(a)
        seen.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in sorted(seen)}


def stream_pairs(con, pattern, cols):
    """Yield (a, b) int pairs from parquet without materializing the whole
    set in Python memory (chunked Arrow record batches)."""
    rel = con.execute(
        f"SELECT {cols[0]}, {cols[1]} FROM read_parquet({glob.glob(pattern)!r})")
    reader = rel.fetch_record_batch(5_000_000)
    for batch in reader:
        a = batch.column(0).to_pylist()
        b = batch.column(1).to_pylist()
        yield from zip(a, b)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")

    # 1. components via union-find over the VERIFIED pair set
    pairs = [(a, b) for a, b, _ in read(con, f"{out_dir}/dedup_simhash_pairs/*.parquet")]
    comp = components(pairs)
    nodes = sorted(comp)

    got_cl = sorted(read(con, f"{out_dir}/dedup_clusters/*.parquet"))
    exp_cl = sorted((n, comp[n], n == comp[n]) for n in nodes)
    assert got_cl == exp_cl, "dedup_clusters != union-find components"
    print(f"PASS dedup_clusters ({len(exp_cl)} rows, "
          f"{len(set(comp.values()))} components, "
          f"max size {max(list(comp.values()).count(c) for c in set(comp.values()))})")

    # 1b. cluster size histogram off the same components
    hist = {}
    for c in set(comp.values()):
        sz = list(comp.values()).count(c)
        hist[sz] = hist.get(sz, 0) + 1
    exp_h = sorted((sz, k, sz * k, (sz - 1) * k) for sz, k in hist.items())
    if glob.glob(f"{out_dir}/dedup_cluster_size_hist/*.parquet"):
        got_h = sorted(read(con, f"{out_dir}/dedup_cluster_size_hist/*.parquet"))
        assert got_h == exp_h, "dedup_cluster_size_hist != component sizes"
        print(f"PASS dedup_cluster_size_hist ({len(exp_h)} rows)")

    # 2. cluster representative: longest doc (n_chars), tie -> min doc_id
    doc_dir = f"{sf_dir}/documents.parquet"
    doc_glob = f"{doc_dir}/*.parquet" if glob.glob(f"{doc_dir}/*.parquet") else doc_dir
    nchars = dict(con.execute(
        f"SELECT doc_id, n_chars FROM read_parquet('{doc_glob}')").fetchall())
    by_cluster = {}
    for n, c in comp.items():
        by_cluster.setdefault(c, []).append(n)
    exp_rep = sorted(
        (c, min(ms, key=lambda i: (-nchars[i], i)), len(ms),
         max(nchars[i] for i in ms))
        for c, ms in by_cluster.items())
    got_rep = sorted(read(con, f"{out_dir}/dedup_cluster_rep/*.parquet"))
    assert got_rep == exp_rep, "dedup_cluster_rep != quality-argmax derivation"
    print(f"PASS dedup_cluster_rep ({len(exp_rep)} rows)")

    # 3. pipeline_filter: re-compose kept set from its (verified) stages
    quality = {r[0]: r for r in read(con, f"{out_dir}/text_quality/*.parquet")}
    exdup = {r[0] for r in read(con, f"{out_dir}/dedup_exact/*.parquet")}
    contaminated = {r[0] for r in read(con, f"{out_dir}/contamination/*.parquet")}
    non_canon = {n for n, c in comp.items() if n != c}
    lang = dict(con.execute(
        f"SELECT doc_id, lang FROM read_parquet('{doc_glob}')").fetchall())
    q_col = con.execute(
        f"SELECT * FROM read_parquet({glob.glob(out_dir + '/text_quality/*.parquet')!r}) LIMIT 0")
    qi = [d[0] for d in q_col.description].index("quality")
    exp_keep = sorted(
        (d, lang[d], quality[d][qi])
        for d in lang
        if d % 10 != 0 and d in quality and quality[d][qi] >= 0.25
        and d not in exdup and d not in non_canon and d not in contaminated)
    got_keep = sorted(read(con, f"{out_dir}/pipeline_filter/*.parquet"))
    assert got_keep == exp_keep, "pipeline_filter != stage re-composition"
    print(f"PASS pipeline_filter ({len(exp_keep)} rows)")

    # 4. semdedup: union-find over the VERIFIED embedding pair set
    # (streamed: 180M pairs at sf3 must not become Python tuples).
    # Leg runs only when dedup_embedding output exists — the sf10 probe
    # skips both (the pair set is ~2B rows there, Θ(output) by semantics;
    # characterized at sf3 instead).
    if not glob.glob(f"{out_dir}/dedup_embedding/*.parquet"):
        print("SKIP semdedup (no dedup_embedding output in this run)")
        return
    ecomp = components(stream_pairs(
        con, f"{out_dir}/dedup_embedding/*.parquet", ("vec_a", "vec_b")))
    dropped = {n for n, c in ecomp.items() if n != c}
    emb_dir = f"{sf_dir}/embeddings.parquet"
    emb_glob = (f"{emb_dir}/*.parquet"
                if glob.glob(f"{emb_dir}/*.parquet") else emb_dir)
    vl = con.execute(
        f"SELECT vec_id, label FROM read_parquet('{emb_glob}')").fetchall()
    by_label = {}
    for vid, lab in vl:
        t = by_label.setdefault(lab, [0, 0, 0, 0])  # n, id_sum, n_drop, drop_sum
        t[0] += 1
        t[1] += vid
        if vid in dropped:
            t[2] += 1
            t[3] += vid
    exp_sd = sorted(
        (lab, n, n - nd, nd, round(nd / n, 4), ids - ds)
        for lab, (n, ids, nd, ds) in by_label.items())
    got_sd = sorted(read(con, f"{out_dir}/semdedup/*.parquet"))
    assert got_sd == exp_sd, "semdedup != union-find over verified pairs"
    print(f"PASS semdedup ({len(exp_sd)} rows, {len(dropped)} dropped)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
