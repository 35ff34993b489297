"""Pair-mass certificate for the banded-LSH signature join (VERDICT
r13 #5): measure — don't infer — the candidate mass the
``dedup_clusters_lsh`` / ``dedup_minhash_lsh`` banded join generates
as the corpus scales.

Quantities per scale (sf0.1 source, 10x, 100x generated corpora):

* ``n_docs`` — corpus size n.
* ``band_rows`` — rows entering the join: exactly ``n · LSH_BANDS``
  (constant-size signatures ⇒ linear by construction).
* ``candidate_rows`` — banded-join OUTPUT rows (one per colliding
  band per pair, pre-verify): the actual join mass.
* ``distinct_pairs`` — unique candidate pairs.
* ``max_bucket`` — largest (band, band-hash) bucket: the worst single
  join key. Bucket join cost is Σ_b |bucket_b|², so
  ``sum_bucket_sq`` is recorded too.

The certificate the numbers back: candidate mass grows ~linearly in n
(each scale copy is a seeded word-level shuffle sharing unigrams but
not trigram shingles, so signatures decorrelate and buckets stay
per-duplicate-group-sized rather than corpus-sized). A quadratic
bucket would show up as sum_bucket_sq growing ~n².

Usage: python tools/lsh_pair_mass.py   (expects .scaleprobe/sf1 and
.scaleprobe/sf10 to exist — run tools/scale_probe.py first) — prints
one JSON line per scale and a verdict line. The r15 measured
numbers for all three bandings are persisted in LSH_PAIR_MASS.json
at the repo root.

``--scaled`` (r15, VERDICT r14 #3): additionally measures the SAME
quantities under the ``minhash_params_for_scale`` banding the
registered ``dedup_clusters_lsh_scaled`` query ships (r=3/b=84/k=252
within the MINHASH_SCALED_MAX_K codegen budget) and prints the
same-boot candidate-mass REDUCTION factor per scale. MEASURED (r15):
10.1x at sf0.1, 32.6x at 10x, 31.7x at 100x (40,523,920 → 1,277,376
distinct pairs) — SHORT of the point-mass closed form 32·j_bg² /
84·j_bg³ ≈ 127x because background Jaccard is a distribution and the
survivors are its upper tail. The function-default max_k=1024 budget
picks r=4/b=213/k=852; its measured 100x reduction was 497x
(→ 81,465 pairs) at the cost of leaving whole-stage codegen.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def measure(
    spark, sf_dir: str, bands: int | None = None, k: int | None = None
) -> dict:
    from csv_2_db_pipeline_data_engineering_spark.operators.dedup import (
        LSH_BANDS,
        MINHASH_K,
        band_rows,
        gram_hash_rows,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from csv_2_db_pipeline_data_engineering_spark.operators.lifecycle import (
        release_scoped_caches,
        scoped_cache,
    )
    from csv_2_db_pipeline_data_engineering_spark.sources.tables import (
        load_table_spread,
    )

    bands = LSH_BANDS if bands is None else bands
    k = MINHASH_K if k is None else k
    docs = load_table_spread(spark, sf_dir, "documents")
    signed = minhash_signatures(scoped_cache(gram_hash_rows(docs)), k)
    ex = scoped_cache(band_rows(signed, bands, k))
    buckets = ex.groupBy("band", "bh").agg(F.count(F.lit(1)).alias("nb"))
    bstats = buckets.agg(
        F.sum("nb").alias("band_rows"),
        F.max("nb").alias("max_bucket"),
        F.sum(F.col("nb") * F.col("nb")).alias("sum_bucket_sq"),
    ).first()
    cands = scoped_cache(lsh_candidate_pairs(signed, bands, k))
    out = {
        "sf_dir": sf_dir,
        "banding": f"r={k // bands}/b={bands}/k={k}",
        "n_docs": docs.count(),
        "band_rows": int(bstats.band_rows),
        "max_bucket": int(bstats.max_bucket),
        "sum_bucket_sq": int(bstats.sum_bucket_sq),
        "candidate_rows": cands.count(),
        "distinct_pairs": cands.distinct().count(),
    }
    release_scoped_caches()
    spark.catalog.clearCache()
    return out


def main() -> None:
    from csv_2_db_pipeline_data_engineering_spark.session import get_session

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scales = [
        ("sf0.1", "/root/testdata/sf0.1"),
        ("10x", os.path.join(root, ".scaleprobe", "sf1")),
        ("100x", os.path.join(root, ".scaleprobe", "sf10")),
    ]
    spark = get_session(
        app_name="lsh_pair_mass",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    scaled_mode = "--scaled" in sys.argv[1:]
    scaled_banding = None
    if scaled_mode:
        from csv_2_db_pipeline_data_engineering_spark.operators.dedup import (
            MINHASH_SCALED_MAX_K,
            minhash_params_for_scale,
        )

        rows, bands, k, bg = minhash_params_for_scale(max_k=MINHASH_SCALED_MAX_K)
        scaled_banding = (bands, k)
        print(
            json.dumps(
                {"scaled_banding": {"rows": rows, "bands": bands, "k": k,
                                    "bg_rate": bg}}
            ),
            flush=True,
        )
    results = {}
    for label, sf_dir in scales:
        if not os.path.isdir(sf_dir):
            print(f"skip {label}: {sf_dir} missing (run tools/scale_probe.py)")
            continue
        results[label] = measure(spark, sf_dir)
        print(json.dumps({label: results[label]}), flush=True)
        if scaled_mode:
            sc = measure(spark, sf_dir, *scaled_banding)
            results[label]["scaled"] = sc
            sc["pair_mass_reduction"] = round(
                results[label]["distinct_pairs"] / max(1, sc["distinct_pairs"]),
                1,
            )
            print(json.dumps({f"{label}_scaled": sc}), flush=True)
    if "sf0.1" in results and "100x" in results:
        a, b = results["sf0.1"], results["100x"]
        growth = b["n_docs"] / a["n_docs"]
        print(
            json.dumps(
                {
                    "verdict": {
                        "n_growth": round(growth, 1),
                        "candidate_growth": round(
                            b["candidate_rows"] / max(1, a["candidate_rows"]), 1
                        ),
                        "bucket_sq_growth": round(
                            b["sum_bucket_sq"] / max(1, a["sum_bucket_sq"]), 1
                        ),
                        "linear_iff": "growth factors ≈ n_growth, not n_growth²",
                    }
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
