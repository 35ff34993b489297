"""One-shot r13 bookkeeping: attach measurement notes to the round's
new SCALE_PROBE_100X.json entries (the probe tool records numbers;
the notes carry the certificates the numbers rest on)."""

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(ROOT, "SCALE_PROBE_100X.json")

NOTES = {
    "span_strip_incremental": (
        "r13 (verdict r12 #2): first DIRECT probe of the 3rd-heaviest "
        "window entry — its O(delta) claim was previously inferred from "
        "dedup_exact_substring's probe (a different plan). 16.1x at 100x "
        "data: the delta-vs-history inverted probe is bounded by the "
        "delta's shingle mass; history df partials merge at read time."
    ),
    "text_span_strip": (
        "r13 (verdict r12 #2): 8.5x at 100x — the ExactSubstr span "
        "removal is two linear passes (shingle inverted join + interval "
        "union strip), strongly sublinear."
    ),
    "text_heavy_hitters_incremental": (
        "r13 (verdict r12 #2): 15.6x at 100x — fixed DxW CMS state from "
        "map-side partials; the extend folds one delta scan into the "
        "persisted counters."
    ),
    "corpus_decontaminate": (
        "r13 (verdict r12 #2): 9.4x at 100x — broadcast eval-index "
        "containment scan + surgical span excision; eval side is "
        "corpus-size-independent."
    ),
    "line_dedup_incremental": (
        "r13 (probe-audit coverage): 5.7x at 100x — tagged O(delta) "
        "line-digest extends; history is read, never re-digested."
    ),
    "dedup_bloom_prefilter": (
        "r13 (probe-audit coverage): 7.9x at 100x — fixed-size bit rows "
        "+ broadcast membership probe."
    ),
    "corpus_snapshot_diff": (
        "r13 (probe-audit coverage): 3.3x at 100x — digest-keyed "
        "full-outer release diff, pure linear shuffle."
    ),
    "ann_ivf_neighbors": (
        "r13 (new window entry): 19.7x at 100x, inside the ~25x band — "
        "integer k-means coarse quantizer is fixed-k; probe/candidate "
        "mass scales with list occupancy (linear)."
    ),
    "ann_ivf": (
        "r13 (verdict r12 #7): 6.7x at 100x — the recall-certified IVF "
        "family anchor the window twins' linearity arguments lean on."
    ),
    "mm_h264_intra_stats": (
        "r13 re-probe after the row-slice reconstruction rewrite "
        "(DC-only residuals are constant 4x4 planes, memoized through "
        "the real dequant/inverse-transform; V/H/DC prediction fills by "
        "row slice): 23.2x at 100x (was 24.5x), kernel 3.7 -> 1.5 "
        "ms/doc single-thread. Effective 100x throughput 0.95 "
        "Mpx/s/core (1.02e9 px / 33.7 s / 32 cores)."
    ),
    "mm_h264_inter_stats": (
        "r13 (verdict r12 #3): 53.4x -> 39.8x after the row-slice "
        "rewrite. QUANTIFIED floor certificate beside the in-band intra "
        "reference: single-thread kernel 3.74 Mpx/s/core enc+dec "
        "(vs intra's 2.33 — the inter kernel is CHEAPER per pixel), and "
        "at 100x the query sustains 1.47 Mpx/s/core (3.07e9 px / 65.1 s "
        "/ 32 cores) vs the 23.2x-in-band intra query's 0.95 Mpx/s/core "
        "on the same run. The remaining ratio gap is denominator "
        "composition, not compute: the inter fixture carries 3x the "
        "pixel mass per doc (64x32 x ~3 frames vs 32x32 x ~2), so its "
        "overhead-bound sf0.1 denominator understates the per-pixel "
        "work by exactly that factor. Plan: one mapInPandas over "
        "_spread ids, zero joins, no superlinear term."
    ),
    "dedup_clusters": (
        "r13 (verdict r12 #7): family anchor probe — exact capped-"
        "Jaccard edges (see dedup_ngram_jaccard's linearity certificate) "
        "+ min-label connected components; the 100 TB clustering path "
        "remains dedup_clusters_lsh (18.1x)."
    ),
    "dedup_simhash_decollided": (
        "r13 (verdict r12 #7): family anchor probe of the REGISTERED "
        "dedup_simhash plan over copy-decollided text (see the "
        "CUSTOM_PROBES builder): the word-shuffle generator preserves "
        "distinct-token sets, and SimHash is a unigram-set fingerprint, "
        "so the raw 100x corpus is an adversarial all-duplicates "
        "workload whose pair OUTPUT is Θ(copies²·docs) by construction "
        "— the first attempt spent 31 min in one sort-spill task "
        "enumerating exactly that. Token-suffixing each copy block "
        "de-collides the fingerprints so the probe measures the "
        "banded-join plan at 100x mass."
    ),
    "graph_triangle_count": (
        "r13 (probe-audit coverage): canonical-edge two-join over the "
        "trade edge table at 100x facts."
    ),
}


def main() -> None:
    with open(PATH) as f:
        data = json.load(f)
    q = data["queries"]
    missing = [k for k in NOTES if k not in q]
    for k, note in NOTES.items():
        if k in q:
            q[k]["note"] = note
    with open(PATH, "w") as f:
        json.dump(data, f, indent=1)
    print(f"annotated {len(NOTES) - len(missing)}; missing: {missing}")


if __name__ == "__main__":
    main()
