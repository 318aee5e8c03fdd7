package graft

import org.apache.spark.sql.SparkSession

/** Plan audit: prints formatted physical plans for representative queries
  * so scan pushdown (PushedFilters/ReadSchema), broadcast joins, and
  * whole-stage-codegen spans can be inspected per round. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val builder = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_filter_project", "q12_lookup_join", "q13_star_join",
               "q16_bbox_join", "q31_minhash_candidates", "q34_cosine_topk",
               "q43_asset_pick_map", "q52_minhash_verified",
               "q55_minhash_banded", "q56_warp_nn", "q58_contamination",
               "q60_stratified_sample", "q62_url_normalize",
               "q63_sessionize", "q66_tfidf", "q72_asof_click",
               "q74_interval_join", "q80_corpus_diff",
               "q87_cms_topk", "q88_mixture_sample", "q89_doc_chunks",
               "q92_quantize_int8", "q94_bloom_join", "q98_salted_join",
               "q99_unigram_logprob", "q126_setsim_join", "q128_triangles",
               "q138_filter_auc", "q139_edit_dedup", "q145_rrf_fusion",
               "q146_containment", "q152_ivfpq", "q153_zonal_stats",
               "q163_embed_cov", "q186_phash_math", "q187_txn_snapshot",
               "q188_hll_file_skip", "q191_dv_delete", "q192_dv_cdc",
               "q195_meta_agg", "q196_meta_filter_group", "q197_history",
               "q246_ccnet_buckets", "q248_quantile_sketch",
               "q249_drift_sketch", "q251_sketch_register_merge",
               "q253_weighted_quantile_sketch")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
