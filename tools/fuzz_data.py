#!/usr/bin/env python3
"""Oracle-parity fuzzer: generate a random (seeded) testdata-shaped
directory, then the caller runs graft.Verify + check.py on it. Surfaces
data-dependent Spark-vs-DuckDB divergence (rounding ties, null paths,
duplicate keys) that the fixed fixtures can't.

Usage: python3 tools/fuzz_data.py <outDir> <seed> [rows] [--adversarial|--degenerate|--hotband|--embdup]

--adversarial skews every distribution at its degenerate edge: one hot
key carrying most rows, near-constant value columns (tie storms for
sorts/windows/percentiles), duplicate event timestamps, empty/1-char/
unicode/whitespace documents, duplicate embedding vectors.

--hotband is the crawl-duplicate pack (VERDICT r13 #7 / r14 item 1):
a single spam text carries ~40% of the documents (one saturated LSH
band bucket -- the candidate-pair blow-up shape the bounded incremental
probe caps), five medium near-identical families carry another ~20%,
and the rest stay organic. Exercises the hot-band star path of
q_dedup_incremental_bounded and the quadratic contrast keys against
their oracles at adversarial duplicate density.

--embdup is the embedding-duplicate pack (r14 fuzz idea): one mega
near-dup cluster carries ~25% of the vectors (the semantic mega-cluster
q_semantic_dedup_bounded routes), 20 medium clusters carry another
~35% (jitter ~0.005/dim -- cos ~0.999 siblings, rounding-tie storms for
the ANN keys' 4dp cos_sim ordering), the rest stay organic. Makes the
emb-index / semantic-dedup keys dup-DENSE on fuzz drives and stresses
the oracled ANN keys' tie-break rules at adversarial density.

--degenerate is the distribution-collapse pack (VERDICT r12 #7):
single-row dimension tables (1 region/nation/customer/supplier), every
value column CONSTANT (total tie storms), ALL events on one user at ONE
timestamp with one event_type, all documents byte-identical, all
embedding vectors identical, constant labels. Tables stay at their
documented MINIMUM sizes rather than empty — q_ann_recall's contract
needs >11 vectors, weibull's moment verdict needs ~10 parts per bucket
— so empty paths are exercised through filters that select nothing
(label BETWEEN 2 AND 5 over constant-0 labels, 'signup' as-of lookups
over a constant event_type) instead of through tables the contracts
exclude.
"""
import sys, random, json, datetime
import pyarrow as pa
import pyarrow.parquet as pq

def main(out, seed, n=3000, adversarial=False, degenerate=False, hotband=False, embdup=False):
    if degenerate:
        return main_degenerate(out, seed, n)
    rnd = random.Random(seed)
    words = ["the","fast","key","order","sort","table","scan","merge","part",
             "window","small","hash","join","spark","group","query","row",
             "data","slow","filter","customer","line","batch","value","a",
             "of","and","to","in","is","vector","column","agg","stream"]
    def money(lo, hi): return round(rnd.uniform(lo, hi), 2)
    def ts_ms(y0=1995, y1=2001):
        t0 = datetime.datetime(y0,1,1); t1 = datetime.datetime(y1,12,31)
        sec = rnd.uniform(0, (t1-t0).total_seconds())
        return t0 + datetime.timedelta(seconds=int(sec))

    nR, nN, nC, nS, nP = 5, 25, max(50, n//40), 10, max(60, n//30)
    nO, nL, nE, nD = max(300, n//4), n, max(400, n//6), max(200, n//12)

    region = {"r_regionkey": pa.array(range(nR), pa.int32()),
              "r_name": pa.array([f"REGION_{i}" for i in range(nR)])}
    nation = {"n_nationkey": pa.array(range(nN), pa.int32()),
              "n_name": pa.array([f"NATION_{i:02d}" for i in range(nN)]),
              "n_regionkey": pa.array([rnd.randrange(nR) for _ in range(nN)], pa.int32())}
    customer = {"c_custkey": pa.array(range(nC), pa.int64()),
                "c_name": pa.array([f"Customer#{i:09d}" for i in range(nC)]),
                "c_nationkey": pa.array([rnd.randrange(nN) for _ in range(nC)], pa.int32()),
                "c_acctbal": pa.array([money(-999, 9999) for _ in range(nC)]),
                "c_mktsegment": pa.array([rnd.choice(["AUTO","BLDG","FURN","HSHLD","MACH"]) for _ in range(nC)])}
    supplier = {"s_suppkey": pa.array(range(nS), pa.int64()),
                "s_name": pa.array([f"Supplier#{i:04d}" for i in range(nS)]),
                "s_nationkey": pa.array([rnd.randrange(nN) for _ in range(nS)], pa.int32()),
                "s_acctbal": pa.array([money(-999, 9999) for _ in range(nS)])}
    part = {"p_partkey": pa.array(range(nP), pa.int64()),
            "p_name": pa.array([" ".join(rnd.sample(words, 4)) for _ in range(nP)]),
            "p_brand": pa.array([f"Brand#{rnd.randrange(1,6)}{rnd.randrange(1,6)}" for _ in range(nP)]),
            "p_type": pa.array([" ".join(rnd.sample(words, 3)).upper() for _ in range(nP)]),
            "p_size": pa.array([rnd.randrange(1, 51) for _ in range(nP)], pa.int32()),
            "p_retailprice": pa.array([money(900, 2000) for _ in range(nP)])}
    # deliberately include some customers with no orders (anti-join path)
    def cust_pick():
        if adversarial and rnd.random() < 0.7: return 3  # hot customer
        return rnd.randrange(int(nC*0.9))
    def price_pick():
        if adversarial: return rnd.choice([5000.00, 250000.00, 480000.00])
        return money(1000, 500000)
    orders = {"o_orderkey": pa.array(range(nO), pa.int64()),
              "o_custkey": pa.array([cust_pick() for _ in range(nO)], pa.int64()),
              "o_orderstatus": pa.array([rnd.choice(["F","O","P"]) for _ in range(nO)]),
              "o_totalprice": pa.array([price_pick() for _ in range(nO)]),
              "o_orderdate": pa.array([ts_ms() for _ in range(nO)], pa.timestamp("ms")),
              "o_orderpriority": pa.array([rnd.choice(["1-URGENT","2-HIGH","3-MEDIUM","4-NOT SPECIFIED","5-LOW"]) for _ in range(nO)])}
    # duplicate (orderkey, linenumber) pairs ON PURPOSE (the fixture trap)
    li_ok = [(7 if adversarial and rnd.random() < 0.6 else rnd.randrange(nO))
             for _ in range(nL)]
    lineitem = {"l_orderkey": pa.array(li_ok, pa.int64()),
                "l_partkey": pa.array([rnd.randrange(nP) for _ in range(nL)], pa.int64()),
                "l_suppkey": pa.array([rnd.randrange(nS) for _ in range(nL)], pa.int64()),
                "l_linenumber": pa.array([rnd.randrange(1, 5) for _ in range(nL)], pa.int32()),
                "l_quantity": pa.array([(1.0 if adversarial and i % 2 == 0
                    else float(rnd.randrange(1, 51))) for i in range(nL)]),
                "l_extendedprice": pa.array([money(900, 105000) for _ in range(nL)]),
                "l_discount": pa.array([(rnd.choice([0.0, 0.05]) if adversarial
                    else round(rnd.randrange(0, 11)/100.0, 2)) for _ in range(nL)]),
                "l_tax": pa.array([round(rnd.randrange(0, 9)/100.0, 2) for _ in range(nL)]),
                "l_returnflag": pa.array([rnd.choice(["A","N","R"]) for _ in range(nL)]),
                "l_linestatus": pa.array([rnd.choice(["F","O"]) for _ in range(nL)]),
                "l_shipdate": pa.array([ts_ms() for _ in range(nL)], pa.timestamp("ms"))}
    t0 = datetime.datetime(2024,1,1)
    if adversarial:
        # tiny distinct-timestamp pool -> exact ties for asof/sessionize/sorts
        pool = [rnd.randrange(0, 90*24*3600*10**9) for _ in range(97)]
        ev_ts = sorted(rnd.choice(pool) for _ in range(nE))
    else:
        ev_ts = sorted(rnd.randrange(0, 90*24*3600*10**9) for _ in range(nE))
    events = {"event_id": pa.array(range(nE), pa.int64()),
              "ts": pa.array([t0 + datetime.timedelta(microseconds=t//1000) for t in ev_ts], pa.timestamp("ns")),
              "user_id": pa.array([rnd.randrange(5 if adversarial else max(10, nE//50)) for _ in range(nE)], pa.int64()),
              "event_type": pa.array([rnd.choice(["view","click","purchase","signup","error"]) for _ in range(nE)]),
              "value": pa.array([money(0, 200) for _ in range(nE)]),
              "props": pa.array([json.dumps({"k": rnd.randrange(100)}) for _ in range(nE)])}
    texts = [" ".join(rnd.choice(words) for _ in range(rnd.randrange(5, 120))) for _ in range(nD)]
    # inject exact duplicates (doc-dedup path)
    for i in range(0, nD, 17):
        if i+1 < nD: texts[i+1] = texts[i]
    if hotband:
        spam = "free offer click now best deal limited time act today " * 2
        fams = ["medium family %d repeated content appearing again and again here" % k
                for k in range(5)]
        for i in range(nD):
            r = rnd.random()
            if r < 0.4: texts[i] = spam
            elif r < 0.6: texts[i] = rnd.choice(fams)
    if adversarial:
        degenerate = ["", " ", "a", "  \t  ", "h\u00e9llo w\u00f6rld \u4f60\u597d",
                      "the the the the the the the the", "\u00df\u00df \u00df\u00df",
                      "x" * 5000]
        for i, t in enumerate(degenerate * 3):
            if i * 7 + 3 < nD: texts[i * 7 + 3] = t
    documents = {"doc_id": pa.array(range(nD), pa.int64()),
                 "text": pa.array(texts),
                 "lang": pa.array([rnd.choice(["en","de","es","fr","zh"]) for _ in range(nD)]),
                 "source": pa.array([f"src{rnd.randrange(20)}" for _ in range(nD)]),
                 "n_chars": pa.array([len(t) for t in texts], pa.int64())}
    dim = 16
    embs = []
    for _ in range(nD):
        v = [rnd.gauss(0,1) for _ in range(dim)]
        s = sum(x*x for x in v) ** 0.5
        embs.append([float(x/s) for x in v])
    if adversarial:
        for i in range(0, nD - 1, 11):
            embs[i+1] = list(embs[i])  # exact duplicate vectors (cos ties)
    if embdup:
        def unit():
            v = [rnd.gauss(0, 1) for _ in range(dim)]
            s = sum(x * x for x in v) ** 0.5
            return [x / s for x in v]
        def jitter(b):
            w = [x + rnd.gauss(0, 0.005) for x in b]
            s = sum(x * x for x in w) ** 0.5
            return [float(x / s) for x in w]
        mega = unit()
        mediums = [unit() for _ in range(20)]
        for i in range(nD):
            r = rnd.random()
            if r < 0.25: embs[i] = jitter(mega)
            elif r < 0.6: embs[i] = jitter(rnd.choice(mediums))
    embeddings = {"vec_id": pa.array(range(nD), pa.int64()),
                  "embedding": pa.array(embs, pa.list_(pa.float32())),
                  "label": pa.array([rnd.randrange(10) for _ in range(nD)], pa.int32())}

    import os
    os.makedirs(out, exist_ok=True)
    for name, cols in [("region",region),("nation",nation),("customer",customer),
                       ("supplier",supplier),("part",part),("orders",orders),
                       ("lineitem",lineitem),("events",events),
                       ("documents",documents),("embeddings",embeddings)]:
        pq.write_table(pa.table(cols), f"{out}/{name}.parquet")
    print(f"wrote fuzz data to {out} (seed={seed}, lineitem={nL})")

def main_degenerate(out, seed, n=3000):
    rnd = random.Random(seed)
    t0 = datetime.datetime(2024, 1, 1)
    nP, nO, nL = 40, 3, max(60, n // 10)
    nE, nD = max(50, n // 60), 24
    region = {"r_regionkey": pa.array([0], pa.int32()),
              "r_name": pa.array(["REGION_0"])}
    nation = {"n_nationkey": pa.array([0], pa.int32()),
              "n_name": pa.array(["NATION_00"]),
              "n_regionkey": pa.array([0], pa.int32())}
    customer = {"c_custkey": pa.array([0], pa.int64()),
                "c_name": pa.array(["Customer#000000000"]),
                "c_nationkey": pa.array([0], pa.int32()),
                "c_acctbal": pa.array([100.0]),
                "c_mktsegment": pa.array(["AUTO"])}
    supplier = {"s_suppkey": pa.array([0], pa.int64()),
                "s_name": pa.array(["Supplier#0000"]),
                "s_nationkey": pa.array([0], pa.int32()),
                "s_acctbal": pa.array([100.0])}
    # parts keep distinct PRIMARY KEYS (the weibull draw is keyed on
    # p_partkey — identical keys would collapse the iid sample the
    # in-query moment envelope assumes) but every attribute is constant
    part = {"p_partkey": pa.array(range(nP), pa.int64()),
            "p_name": pa.array(["the fast key order"] * nP),
            "p_brand": pa.array(["Brand#11"] * nP),
            "p_type": pa.array(["THE FAST KEY"] * nP),
            "p_size": pa.array([7] * nP, pa.int32()),
            "p_retailprice": pa.array([1000.0] * nP)}
    fixed_dt = datetime.datetime(1997, 6, 15)
    orders = {"o_orderkey": pa.array(range(nO), pa.int64()),
              "o_custkey": pa.array([0] * nO, pa.int64()),
              "o_orderstatus": pa.array(["F"] * nO),
              "o_totalprice": pa.array([5000.0] * nO),
              "o_orderdate": pa.array([fixed_dt] * nO, pa.timestamp("ms")),
              "o_orderpriority": pa.array(["1-URGENT"] * nO)}
    # duplicate (orderkey, linenumber) pairs stay ON PURPOSE (the trap)
    lineitem = {"l_orderkey": pa.array([i % nO for i in range(nL)], pa.int64()),
                "l_partkey": pa.array([i % nP for i in range(nL)], pa.int64()),
                "l_suppkey": pa.array([0] * nL, pa.int64()),
                "l_linenumber": pa.array([rnd.randrange(1, 5) for _ in range(nL)], pa.int32()),
                "l_quantity": pa.array([1.0] * nL),
                "l_extendedprice": pa.array([100.0] * nL),
                "l_discount": pa.array([0.0] * nL),
                "l_tax": pa.array([0.0] * nL),
                "l_returnflag": pa.array(["A"] * nL),
                "l_linestatus": pa.array(["F"] * nL),
                "l_shipdate": pa.array([fixed_dt] * nL, pa.timestamp("ms"))}
    events = {"event_id": pa.array(range(nE), pa.int64()),
              "ts": pa.array([t0] * nE, pa.timestamp("ns")),
              "user_id": pa.array([0] * nE, pa.int64()),
              "event_type": pa.array(["view"] * nE),
              "value": pa.array([1.0] * nE),
              "props": pa.array(["{\"k\": 1}"] * nE)}
    documents = {"doc_id": pa.array(range(nD), pa.int64()),
                 "text": pa.array(["the fast key order sort table scan merge"] * nD),
                 "lang": pa.array(["en"] * nD),
                 "source": pa.array(["src0"] * nD),
                 "n_chars": pa.array([40] * nD, pa.int64())}
    v = [rnd.gauss(0, 1) for _ in range(16)]
    s = sum(x * x for x in v) ** 0.5
    one = [float(x / s) for x in v]
    embeddings = {"vec_id": pa.array(range(nD), pa.int64()),
                  "embedding": pa.array([list(one)] * nD, pa.list_(pa.float32())),
                  "label": pa.array([0] * nD, pa.int32())}
    import os
    os.makedirs(out, exist_ok=True)
    for name, cols in [("region", region), ("nation", nation), ("customer", customer),
                       ("supplier", supplier), ("part", part), ("orders", orders),
                       ("lineitem", lineitem), ("events", events),
                       ("documents", documents), ("embeddings", embeddings)]:
        pq.write_table(pa.table(cols), f"{out}/{name}.parquet")
    print(f"wrote DEGENERATE fuzz data to {out} (seed={seed}, lineitem={nL})")

if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(args[0], int(args[1]), int(args[2]) if len(args) > 2 else 3000,
         adversarial="--adversarial" in sys.argv,
         hotband="--hotband" in sys.argv,
         embdup="--embdup" in sys.argv,
         degenerate="--degenerate" in sys.argv)
