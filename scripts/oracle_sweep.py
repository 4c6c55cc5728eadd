#!/usr/bin/env python
"""Full Spark-vs-DuckDB oracle sweep at an arbitrary sf_dir — the same
comparison the driver's correctness gate runs (column-sorted,
order-insensitive value hash), but over EVERY oracled registry query.

Usage: python scripts/oracle_sweep.py [SF_DIR] [--out FILE]
           [--resume FILE] [--spark-only name1,name2]
           [--only prefix1,prefix2]
Exit code 0 iff every oracled query matches.

--resume FILE     reuse the matched results of a previous --out JSON
                  (only re-runs queries that failed / never ran).
--only a,b        restrict the sweep to queries whose name equals or
                  starts with one of the given prefixes (family-
                  targeted scale runs, e.g. --only doc_,emb_,graph_).
--skip a,b        exclude these exact names (scale dirs where a
                  query's own output/verification volume is quadratic
                  in the clone factor — exactness for those is
                  attested at the smaller SFs).
--spark-only a,b  for these names, run ONLY the Spark side and record
                  rows+sec (no oracle hash). For clone-replicated
                  scale dirs (make_scale_data.py) a handful of
                  pair-output queries are quadratic in the replication
                  factor (every doc gains K-1 exact clones, so every
                  base near-dup pair becomes K^2 pairs): the Spark
                  side streams that fine, but hash-compare would
                  collect 10^8 rows to the driver and the all-pairs
                  DuckDB oracles are O(n^2) in corpus size. Their
                  exactness is already proven by the full-hash sweep
                  at the base SF; at scale the datapoint that matters
                  is that the plan completes and how fast.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from the_hive_spark import registry
from the_hive_spark.session import get_spark
from the_hive_spark.tables import TABLE_NAMES


def _hash(df) -> tuple[int, str]:
    # Normalize dtypes before rendering: a NULL-bearing bigint column
    # comes back float64 from Spark's toPandas ('1.0'/nan) but may stay
    # int64/NA from DuckDB's fetchdf — str() then differs on IDENTICAL
    # values, a false MISMATCH (never a false green) that wastes sweep
    # re-runs. Round-trip integral float columns through nullable Int64
    # so both fetch paths render the same canonical text.
    df = df.copy()
    for c in df.columns:
        col = df[c]
        try:
            if col.dtype.kind == "f":
                nonnull = col.dropna()
                if (nonnull == nonnull.round()).all():  # incl. all-NULL
                    df[c] = col.astype("Int64")
            elif col.dtype.kind == "i":
                df[c] = col.astype("Int64")  # match NULL-bearing form
        except (ValueError, TypeError, OverflowError):
            pass  # inf / out-of-int64 floats: leave as-is (worst case
            # a false mismatch, same as before this normalization)
    rows = ["\t".join(map(str, r)) for r in df.itertuples(index=False)]
    rows.sort()
    return len(rows), hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    spark_only: set[str] = set()
    if "--spark-only" in sys.argv:
        spark_only = set(
            sys.argv[sys.argv.index("--spark-only") + 1].split(",")
        )
    resumed: dict[str, dict] = {}
    if "--resume" in sys.argv:
        with open(sys.argv[sys.argv.index("--resume") + 1]) as fh:
            prior = json.load(fh).get("results", {})
        # reuse hash-verified rows, and completed spark-only rows
        # (match None + rows recorded) ONLY when the current run also
        # lists the query in --spark-only — otherwise a prior partial
        # sweep's completion row would silently block the hash
        # verification this invocation was asked to perform
        resumed = {
            k: v
            for k, v in prior.items()
            if v.get("match")
            or (v.get("match") is None and "rows" in v and k in spark_only)
        }
    only: list[str] | None = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1].split(",")
    skip: set[str] = set()
    if "--skip" in sys.argv:
        skip = set(sys.argv[sys.argv.index("--skip") + 1].split(","))
    registry.load_all()
    spark = get_spark(app_name="oracle-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in TABLE_NAMES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    def _spark_dead(s) -> bool:
        try:
            return s.sparkContext._jsc.sc().isStopped()
        except Exception:  # noqa: BLE001
            return True

    def _fresh_spark():
        # A crashed JVM (one lost task kills the job in local mode —
        # there are no task retries on local[*]) leaves a stopped
        # SparkContext behind; getOrCreate() would hand it right back.
        # Drop the singleton and rebuild, and clear the matstore,
        # whose entries hold DataFrames bound to the dead session.
        from pyspark.sql import SparkSession

        try:
            SparkSession.builder.getOrCreate().stop()
        except Exception:  # noqa: BLE001
            pass
        SparkSession._instantiatedSession = None
        SparkSession._activeSession = None
        try:
            from the_hive_spark.functions import matstore

            matstore.clear()
        except Exception:  # noqa: BLE001
            pass
        s = get_spark(app_name="oracle-sweep")
        s.sparkContext.setLogLevel("ERROR")
        return s

    def _run_one(s, name: str) -> dict:
        # spark_sec vs oracle_sec recorded separately: at 10×+ scale
        # several DuckDB oracles cost 10-50× the Spark plan they
        # verify, and a conflated total reads as a Spark regression
        # (round 6 learned this on graph_label_propagation3: 18 s
        # Spark + ~16 min oracle in one number).
        t0 = time.perf_counter()
        a = registry.QUERIES[name](s, sf_dir).toPandas()
        t1 = time.perf_counter()
        a = a.reindex(sorted(a.columns), axis=1)
        b = con.execute(registry.ORACLES[name]).fetchdf()
        t2 = time.perf_counter()
        b = b.reindex(sorted(b.columns), axis=1)
        na, ha = _hash(a)
        nb, hb = _hash(b)
        ok = (
            na == nb
            and ha == hb
            and [c.lower() for c in a.columns] == [c.lower() for c in b.columns]
        )
        return {
            "match": ok,
            "rows": na,
            "oracle_rows": nb,
            "sec": round(time.perf_counter() - t0, 2),
            "spark_sec": round(t1 - t0, 2),
            "oracle_sec": round(t2 - t1, 2),
        }

    results: dict[str, dict] = {}
    bad = 0
    for name in registry.QUERIES:
        if name not in registry.ORACLES and name not in spark_only:
            # rows-only queries may still run as completion evidence
            # when explicitly listed in --spark-only
            continue
        if only is not None and not any(name.startswith(p) for p in only):
            continue
        if name in skip:
            continue
        if name in resumed:
            results[name] = {**resumed[name], "resumed": True}
            continue
        t0 = time.perf_counter()
        try:
            if name in spark_only:
                n_rows = registry.QUERIES[name](spark, sf_dir).count()
                # match stays None: a spark-only run is COMPLETION
                # evidence, not verification — conflating it with a
                # hash-verified True would make the summary lie
                results[name] = {
                    "match": None,
                    "oracle": "skipped_spark_only",
                    "rows": n_rows,
                    "sec": round(time.perf_counter() - t0, 2),
                }
            else:
                results[name] = _run_one(spark, name)
        except Exception as exc:  # noqa: BLE001
            err1 = f"{type(exc).__name__}: {str(exc)[:200]}"
            if _spark_dead(spark):
                # session died (task OOM etc) — rebuild and retry ONCE
                # so one crash can't zero out the rest of the sweep
                print(f"RESTART after {name}: {err1}", flush=True)
                spark = _fresh_spark()
                try:
                    results[name] = _run_one(spark, name)
                    results[name]["restarted"] = True
                except Exception as exc2:  # noqa: BLE001
                    if _spark_dead(spark):
                        spark = _fresh_spark()
                    results[name] = {
                        "match": False,
                        "err": err1,
                        "err_retry": f"{type(exc2).__name__}: "
                        f"{str(exc2)[:200]}",
                        "sec": round(time.perf_counter() - t0, 2),
                    }
            else:
                results[name] = {
                    "match": False,
                    "err": err1,
                    "sec": round(time.perf_counter() - t0, 2),
                }
        if results[name]["match"] is False:
            bad += 1
            print(f"MISMATCH {name}: {results[name]}", flush=True)
        elif results[name]["match"] is None:
            print(
                f"spark-only {name} rows={results[name]['rows']}"
                f" ({results[name]['sec']}s)", flush=True
            )
        else:
            print(f"ok {name} ({results[name]['sec']}s)", flush=True)
        if out_path:
            # checkpoint after EVERY query: a killed/crashed sweep
            # resumes from its partial artifact (--resume) instead of
            # redoing an hour of completed work (summary marked
            # partial until the final rewrite below)
            with open(out_path, "w") as fh:
                json.dump(
                    {"summary": {"partial": True}, "results": results},
                    fh,
                    indent=1,
                )

    n = len(results)
    n_spark_only = sum(1 for r in results.values() if r["match"] is None)
    summary = {
        "sf_dir": sf_dir,
        "n_oracled": n,
        "n_match": n - bad - n_spark_only,
        "n_spark_only": n_spark_only,
        "n_bad": bad,
        "total_sec": round(sum(r["sec"] for r in results.values()), 1),
    }
    if skip:
        # self-documenting artifact: what was deliberately excluded
        summary["skipped"] = sorted(skip)
    print(json.dumps(summary), flush=True)
    if out_path:
        with open(out_path, "w") as fh:
            json.dump({"summary": summary, "results": results}, fh, indent=1)
    try:
        spark.stop()
    except Exception:  # noqa: BLE001
        pass
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
