package graft

/** QUANTIFIED ANN recall gates (r20, the r19 verdict's #6): the named
  * constants every approximate-similarity spec asserts against. One
  * place, explicit numbers — a hash/clustering/seed regression fails a
  * NAMED gate, not a fuzzy overlap check. The negative tests in
  * OperatorSpec ("recall gates have teeth") run deliberately broken
  * geometry/assignments through the SAME measurements and assert they
  * fall BELOW these gates — proving the gates discriminate. */
object AnnRecallGates {
  /** `q_sim_ann_ivf` top-10 vs brute-force cosine top-10 (measured
    * 9/10 at sf0.01 with nprobe=2 of k=8 — the honest nprobe/k
    * trade). */
  val IvfRecallAt10: Double = 0.8

  /** `q_sim_knn_lsh` (a,b) pairs vs exact kNN-join pairs (BRP-LSH,
    * 3 tables, bucketLength 0.7, seed 42 — measured ~0.6 at
    * sf0.01; LSH trades recall for the bucket-join plan). */
  val LshKnnRecall: Double = 0.5

  /** Native MinHash candidate pairs vs planted strong (Jaccard ≥ 0.9)
    * pairs (ScaleSpec's banded-minhash spec). */
  val MinhashStrongRecall: Double = 0.8
}
