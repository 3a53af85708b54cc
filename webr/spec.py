"""Versioned spec constants for the scoring rule, blocking, and clustering.

The reference's trained XGB model (resources/model/compare/xgb_new.pkl,
util/config.py:23) is absent from its repo, so per SURVEY.md §7.0 the
*scoring rule* is part of this spec: a deterministic logistic combination of
the reference's feature families (Jaro-Winkler / Levenshtein on names &
hosts, TF-IDF cosine on text, Soundex agreement, Jaccard on titles),
thresholded at EPS like the reference classifier probability
(author_disambiguation.py:16-17: eps=0.85, minPts=2).

Anything here changes => goldens change; bump SCORING_VERSION.
"""

# v2: minhash = affine maps over one base md5/shingle
# v3: weight arrays keyed by int64 token_hash ids (md5[:15]), hash-sorted
# v4: minhash base hash = crc32, affine maps vectorized (31-bit coeffs)
# v5: tokenize closed under lower() (NFKD can surface uppercase ASCII
#     from modifier letters)
# v6: cannot-link constraint replay after CC (webr.constraints) —
#     clusters are all-pairs name-compatible; vetoed bridges -> noise
# v7: pair_scores carries F7/F8 categorical first/middle match columns,
#     AND two score-arithmetic changes that can perturb body_cos on
#     affected pairs: sparse_cosine_sorted switched from a sequential
#     fold to np.sum (pairwise summation) and weight_arrays now merges
#     60-bit hash collisions into one entry. Don't trust pre-v7 scores
#     in parity debugging.
# v8: mentions/mention_feats carry warc_ts and pair_scores carries the
#     F10/F11-analog observational columns ts_day_diff (capped) +
#     era_match (scores unchanged — these are NOT score inputs; bump
#     invalidates old-schema checkpoints)
SCORING_VERSION = "v9"  # v9: sparse_cosine_sorted's intersection dot is
                        # a SEQUENTIAL ascending-token-id fold (was
                        # numpy pairwise np.sum since v7) so the
                        # batched-cosine engine kernel (one bincount
                        # across all pairs) and the scalar oracle twin
                        # accumulate in the same order. body_cos may
                        # differ from v8 by ulps on pairs with >8 shared
                        # tokens; SCORE_DECIMALS rounding absorbs it.

# F10/F11 analogs on crawl time (ref classifier/feature_vector.py:143-164
# year-era bucket; feature_vector_bow.py:159-165 capped |year diff|)
TS_ERA_YEARS = 5       # era bucket = year // TS_ERA_YEARS
TS_DAY_DIFF_CAP = 365  # |day diff| capped; -1 = either side missing

# clustering thresholds (ref author_disambiguation.py:16-17)
EPS = 0.85          # edge iff score >= EPS
MIN_PTS = 2         # with minPts=2 DBSCAN == connected components (SURVEY §2.8)

# feature weights (raw in [0,1]) and logistic calibration, tuned so that
# truth-pairwise-F1 = 1.0 with zero false-positive edges on three
# independent synthetic corpora (seeds 7/11/42) — see tests
W_NAME_JW = 0.30
W_SOUNDEX = 0.05
W_TITLE_JAC = 0.10
W_BODY_COS = 0.50
W_HOST_SIM = 0.05
CAL_CENTER = 0.42
CAL_SLOPE = 12.0
COS_MIN = 0.30      # precision gate: an edge additionally requires this much
                    # tf-idf content agreement (analog of the reference's
                    # compat pre-filter idea applied to content)
SCORE_DECIMALS = 9  # round before thresholding: kills float ulp noise across
                    # summation orders while never flipping real decisions

# blocking (SURVEY §2.1 A1/A2, F13; skew handling §4)
MAX_BLOCK_SIZE = 64   # blocks larger than this switch from all-pairs
                      # self-join (J1) to sorted-neighborhood windowing
SN_WINDOW = 12        # sorted-neighborhood lookahead for mega-blocks
MINHASH_BANDS = 4
MINHASH_ROWS = 2
MINHASH_SHINGLE = 3

# incremental query (ref record_based_query.py:19-21; values adapted to the
# similarity-scored spec — reference's were distances under its own model)
CLUSTER_EPS = 0.30    # stage-1: tf-idf cosine(query BoW, cluster profile)
RECORD_EPS = EPS      # stage-2: pairwise score vs members
MIN_VOTES = 2         # ref record_based_query.py:113-117
TOP_K = 10
