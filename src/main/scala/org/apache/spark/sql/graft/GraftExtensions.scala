package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** SparkSessionExtensions entry point: registers the graft native
  * expressions as SQL functions, so `spark.sql("SELECT float_vec_dot(a,b)")`
  * works next to the Column API. Activate with
  * `.config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("float_vec_dot"),
      info("float_vec_dot", "float_vec_dot(a, b) - dot product of two float arrays (double accumulation)"),
      (args: Seq[Expression]) => FloatVecDot(args(0), args(1))))

    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(hashes) - 64-bit SimHash of an array of token hashes"),
      (args: Seq[Expression]) => SimHash64(args(0))))

    ext.injectFunction((
      FunctionIdentifier("scored_top_k"),
      info("scored_top_k",
        "scored_top_k(score, id, k) - aggregate: the k highest-score (score, id) pairs per group, distinct by id, sorted; partial-aggregates map-side"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "scored_top_k(score, id, k) takes 3 arguments")
        require(args(2).foldable, "scored_top_k's k must be a literal")
        ScoredTopK(args(0), args(1),
          args(2).eval().asInstanceOf[Number].intValue())
      }))

    // ---- table functions: the whole-table operators the reference's
    // Execute-Query-tab user reaches by typing SQL. Each takes a
    // table/view name (resolved through the active session's catalog) +
    // literal parameters and returns the operator's result as a relation:
    //   SELECT * FROM graft_jaccard_join('docs', 'text', 'doc_id', 0.7)
    //   SELECT * FROM graft_connected_components('pairs', 'id_a', 'id_b')
    //   SELECT * FROM graft_analyze_table('lineitem')
    //   SELECT * FROM graft_stratified_sample('docs', 'doc_id', 'source', 10)
    //   SELECT * FROM graft_contamination('docs', 'text', 'doc_id', 'bench', 'text', 8)
    //   SELECT * FROM graft_bigram_lm('docs', 'text', 'doc_id')
    //   SELECT * FROM graft_bloom_semi_join('lineitem', 'l_orderkey', 'hot', 'o_orderkey', 2000)
    // graft_jaccard_join expands to the operator's (lazy) plan;
    // connected-components and analyze are driver-coordinated algorithms
    // (an iterative loop / a one-pass profile), so those two EXECUTE
    // during analysis and embed their materialized result — procedure
    // semantics behind table-function syntax, same as a CALL statement.

    def strArg(e: Expression, what: String): String = {
      require(e.foldable, s"$what must be a literal string")
      String.valueOf(e.eval())
    }
    def tableArg(e: Expression): org.apache.spark.sql.DataFrame =
      SparkSession.active.table(strArg(e, "the table/view name"))
    // SQL fractional literals eval to Catalyst Decimal (not j.l.Number) —
    // accept both so callers can write 0.9 as well as 0.9D
    def dblArg(e: Expression, what: String): Double = {
      require(e.foldable, s"$what must be a literal number")
      e.eval() match {
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case n: Number => n.doubleValue()
        case other => throw new IllegalArgumentException(
          s"$what must be numeric, got $other")
      }
    }

    ext.injectTableFunction((
      FunctionIdentifier("graft_jaccard_join"),
      info("graft_jaccard_join",
        "graft_jaccard_join(table, textCol, idCol, threshold) - exact n-gram Jaccard similarity self-join (PPJoin prefix filter): rows (id_a, id_b, jaccard) with jaccard >= threshold"),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_jaccard_join(table, textCol, idCol, threshold) takes 4 arguments")
        val df = tableArg(args(0))
        val textCol = strArg(args(1), "textCol")
        val idCol = strArg(args(2), "idCol")
        val t = dblArg(args(3), "threshold")
        // the expensive df-ordered shingle projection is memoized per
        // table IDENTITY (sorted path set) + CONTENT version (file-
        // manifest fingerprint): repeated SQL invocations share ONE
        // persisted projection instead of leaking one block-manager
        // entry per call, and when the table is OVERWRITTEN in place
        // (same paths, new fingerprint) the superseded version's blocks
        // are unpersisted instead of stranding for the session lifetime
        // (memoVersioned). A file-less relation (temp view over
        // literals) falls back to a ContextCleaner-managed
        // localCheckpoint
        val files = df.inputFiles
        val ordered =
          if (files.nonEmpty) {
            val fp = graft.sources.Layout
              .filesFingerprint(SparkSession.active, files.toSeq)
            // identity = the table's DIRECTORY set, not the part-file
            // names (an overwrite writes fresh part-file names into the
            // same location — the identity must survive that, only the
            // fingerprint changes)
            val identity = files.toSeq
              .map(f => f.substring(0, math.max(f.lastIndexOf('/'), 0)))
              .distinct.sorted.mkString(",")
            graft.dedup.DedupCache.memoVersioned(
              s"sql:$identity#$textCol#$idCol#shingleProjection3", fp)(
              graft.dedup.Dedup.shingleProjection(df, textCol, idCol, 3))
          } else
            graft.dedup.Dedup.shingleProjection(df, textCol, idCol, 3)
              .localCheckpoint()
        graft.dedup.Dedup.jaccardJoinOrdered(ordered, t)
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_connected_components"),
      info("graft_connected_components",
        "graft_connected_components(table, aCol, bCol) - connected components over the pair table: rows (id, cluster_id), cluster_id = component minimum. Executes eagerly (iterative algorithm)."),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "graft_connected_components(table, aCol, bCol) takes 3 arguments")
        graft.dedup.Dedup.connectedComponents(tableArg(args(0)),
          strArg(args(1), "aCol"), strArg(args(2), "bCol"))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_analyze_table"),
      info("graft_analyze_table",
        "graft_analyze_table(table) - one-pass column profile: (column_name, data_type, n_rows, null_count, approx_distinct, min, max). Executes eagerly."),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_analyze_table(table) takes 1 argument")
        graft.catalog.Catalog.analyzeTable(tableArg(args(0)))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_stratified_sample"),
      info("graft_stratified_sample",
        "graft_stratified_sample(table, idCol, strataCol, n) - exact-size stratified sample: the n rows per stratum with the smallest md5 rank, as (stratum, smp_rank, id)"),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_stratified_sample(table, idCol, strataCol, n) takes 4 arguments")
        require(args(3).foldable, "n must be a literal")
        graft.ops.TrainingPrep.stratifiedSample(tableArg(args(0)),
          strArg(args(1), "idCol"), strArg(args(2), "strataCol"),
          args(3).eval().asInstanceOf[Number].intValue())
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_contamination"),
      info("graft_contamination",
        "graft_contamination(table, textCol, idCol, benchTable, benchTextCol, k) - per-doc fraction of distinct word k-grams found in the benchmark table: (id, n_grams, n_hit, score), contaminated docs only"),
      (args: Seq[Expression]) => {
        require(args.length == 6,
          "graft_contamination(table, textCol, idCol, benchTable, benchTextCol, k) takes 6 arguments")
        require(args(5).foldable, "k must be a literal")
        graft.ops.TrainingPrep.contaminationScore(tableArg(args(0)),
          strArg(args(1), "textCol"), strArg(args(2), "idCol"),
          tableArg(args(3)), strArg(args(4), "benchTextCol"),
          args(5).eval().asInstanceOf[Number].intValue())
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_bigram_lm"),
      info("graft_bigram_lm",
        "graft_bigram_lm(table, textCol, idCol) - bigram LM quality score under the corpus's own MLE model: (id, n_bigrams, ll_u) with ll_u in micro-log-prob units"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "graft_bigram_lm(table, textCol, idCol) takes 3 arguments")
        graft.ops.TrainingPrep.bigramLmScore(tableArg(args(0)),
          strArg(args(1), "textCol"), strArg(args(2), "idCol"))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_bpe_encode"),
      info("graft_bpe_encode",
        "graft_bpe_encode(table, textCol, idCol, nMerges) - train a BPE subword tokenizer on the table's text (nMerges Sennrich merges over the vocabulary-sized word table) and encode every row as (id, subwords). Training executes eagerly (iterative algorithm — procedure semantics); the encode itself is a lazy per-row kernel over the broadcast merge list."),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_bpe_encode(table, textCol, idCol, nMerges) takes 4 arguments")
        require(args(3).foldable, "nMerges must be a literal")
        val df = tableArg(args(0))
        val textCol = strArg(args(1), "textCol")
        val merges = graft.text.Bpe.train(df, textCol,
          args(3).eval().asInstanceOf[Number].intValue())
        graft.text.Bpe.encodeDocs(SparkSession.active, df, textCol,
          strArg(args(2), "idCol"), merges)
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_pruned_scan"),
      info("graft_pruned_scan",
        "graft_pruned_scan(dir, column, lo, hi) - manifest-pruned parquet scan: reads only the files whose footer min/max admit column IN [lo, hi] (numeric columns), plus the residual row filter. The SQL surface of Layout.readPrunedByRange."),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_pruned_scan(dir, column, lo, hi) takes 4 arguments")
        require(args(2).foldable && args(3).foldable,
          "lo and hi must be literals")
        graft.sources.Layout.readPrunedByRange(SparkSession.active,
          strArg(args(0), "the parquet dir"), strArg(args(1), "column"),
          args(2).eval().asInstanceOf[Number].doubleValue(),
          args(3).eval().asInstanceOf[Number].doubleValue())
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_heavy_hitters"),
      info("graft_heavy_hitters",
        "graft_heavy_hitters(table, keyCol, m, capacity) - exact top-m (hh_key, n) of keyCol via bounded-memory Misra-Gries candidates + exact broadcast-filtered recount; throws if the MG certificate cannot prove exactness (raise capacity). Executes eagerly (multi-pass algorithm - procedure semantics)."),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_heavy_hitters(table, keyCol, m, capacity) takes 4 arguments")
        require(args(2).foldable && args(3).foldable,
          "m and capacity must be literals")
        graft.ops.HeavyHitters.exactTopK(tableArg(args(0)),
          strArg(args(1), "keyCol"),
          args(2).eval().asInstanceOf[Number].intValue(),
          args(3).eval().asInstanceOf[Number].intValue())
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_bloom_semi_join"),
      info("graft_bloom_semi_join",
        "graft_bloom_semi_join(factTable, factKey, keysTable, keyCol, expectedKeys) - fact rows whose key might be in the keys table (bloom sketch, ~1% false positives, no false negatives). Builds the sketch eagerly (one aggregate over the keys side)."),
      (args: Seq[Expression]) => {
        require(args.length == 5,
          "graft_bloom_semi_join(factTable, factKey, keysTable, keyCol, expectedKeys) takes 5 arguments")
        require(args(4).foldable, "expectedKeys must be a literal")
        val fact = tableArg(args(0))
        val keys = tableArg(args(2)) // bind col() to THIS instance
        graft.ops.BloomPrune.semiPrune(fact,
          fact.col(strArg(args(1), "factKey")),
          keys, keys.col(strArg(args(3), "keyCol")),
          args(4).eval().asInstanceOf[Number].longValue())
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_pagerank"),
      info("graft_pagerank",
        "graft_pagerank(table, srcCol, dstCol, iters) - integer-exact PageRank over the edge table: (node, rank_mu) in micro-units. Executes eagerly (iterative algorithm - procedure semantics)."),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_pagerank(table, srcCol, dstCol, iters) takes 4 arguments")
        require(args(3).foldable, "iters must be a literal")
        val t = tableArg(args(0))
        graft.ops.PageRank.run(
          t.select(t.col(strArg(args(1), "srcCol")).as("src"),
            t.col(strArg(args(2), "dstCol")).as("dst")),
          args(3).eval().asInstanceOf[Number].intValue())
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_bfs"),
      info("graft_bfs",
        "graft_bfs(edgeTable, srcCol, dstCol, seedTable, seedCol, maxHops) - multi-source BFS: (node, dist) = exact minimum hop distance from the seed set, bounded by maxHops. Executes eagerly (iterative algorithm - procedure semantics)."),
      (args: Seq[Expression]) => {
        require(args.length == 6,
          "graft_bfs(edgeTable, srcCol, dstCol, seedTable, seedCol, maxHops) takes 6 arguments")
        require(args(5).foldable, "maxHops must be a literal")
        val e = tableArg(args(0))
        val sd = tableArg(args(3))
        graft.ops.Bfs.run(
          e.select(e.col(strArg(args(1), "srcCol")).as("src"),
            e.col(strArg(args(2), "dstCol")).as("dst")),
          sd.select(sd.col(strArg(args(4), "seedCol")).as("node")),
          args(5).eval().asInstanceOf[Number].intValue())
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_triangles"),
      info("graft_triangles",
        "graft_triangles(table, aCol, bCol) - per-node triangle counts over the undirected pair table: (node, n_tri), nodes in >= 1 triangle. Executes eagerly (the degree-ordered orientation is materialized)."),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "graft_triangles(table, aCol, bCol) takes 3 arguments")
        val t = tableArg(args(0))
        graft.ops.Triangles.countPerNode(
          t.select(t.col(strArg(args(1), "aCol")).as("a"),
            t.col(strArg(args(2), "bCol")).as("b")))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_snapshot_diff"),
      info("graft_snapshot_diff",
        "graft_snapshot_diff(oldTable, newTable, keyCol) - the I/U/D changelog turning oldTable into newTable: key, op, and the data columns (new values for I/U, old values for D). One full-outer key join - a lazy plan."),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "graft_snapshot_diff(oldTable, newTable, keyCol) takes 3 arguments")
        graft.ops.Merge.snapshotDiff(tableArg(args(0)), tableArg(args(1)),
          Seq(strArg(args(2), "keyCol")))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_outliers"),
      info("graft_outliers",
        "graft_outliers(table, groupCol, valCol, tieCol) - exact group-wise IQR outlier screen: (group, n, q1, q3, n_outliers, sum_outliers) with order-statistic quartiles and Tukey fences. A lazy plan."),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_outliers(table, groupCol, valCol, tieCol) takes 4 arguments")
        graft.ops.Outliers.iqrByGroup(tableArg(args(0)),
          strArg(args(1), "groupCol"), strArg(args(2), "valCol"),
          strArg(args(3), "tieCol"))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_kmeans"),
      info("graft_kmeans",
        "graft_kmeans(table, idCol, vecCol, k, iters) - integer-exact k-means over the float-array column: the input rows + a cluster column. Executes eagerly (iterative algorithm - procedure semantics)."),
      (args: Seq[Expression]) => {
        require(args.length == 5,
          "graft_kmeans(table, idCol, vecCol, k, iters) takes 5 arguments")
        require(args(3).foldable && args(4).foldable, "k and iters must be literals")
        graft.similarity.KMeansInt.fit(tableArg(args(0)),
          strArg(args(1), "idCol"), strArg(args(2), "vecCol"),
          args(3).eval().asInstanceOf[Number].intValue(),
          args(4).eval().asInstanceOf[Number].intValue())._1
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_phrase_search"),
      info("graft_phrase_search",
        "graft_phrase_search(table, textCol, idCol, n) - the corpus's most frequent n-token phrase and every row containing it: (phrase, id, n_occ). Builds the positional index eagerly."),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_phrase_search(table, textCol, idCol, n) takes 4 arguments")
        require(args(3).foldable, "n must be a literal")
        graft.text.PhraseIndex.topPhraseDocs(tableArg(args(0)),
          strArg(args(1), "textCol"), strArg(args(2), "idCol"),
          args(3).eval().asInstanceOf[Number].intValue())
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_substring_dedup"),
      info("graft_substring_dedup",
        "graft_substring_dedup(table, textCol, idCol, l) - exact repeated-substring excision (Lee et al. ExactSubstr): removes every >=l-token span whose text occurs elsewhere in the corpus, keeping the first occurrence; one hash-audited row per doc (id, n_tok, n_dup_win, n_spans, n_removed_tok, clean_md5)."),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_substring_dedup(table, textCol, idCol, l) takes 4 arguments")
        require(args(3).foldable, "l must be a literal")
        graft.dedup.SubstringDedup.excise(tableArg(args(0)),
          strArg(args(1), "textCol"), strArg(args(2), "idCol"),
          args(3).eval().asInstanceOf[Number].intValue())
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_semantic_dedup"),
      info("graft_semantic_dedup",
        "graft_semantic_dedup(table, idCol, vecCol, k, iters, threshold) - SemDeDup-class semantic dedup over the float-array embedding column: (id, cluster, kept). Executes the k-means clustering eagerly (procedure semantics)."),
      (args: Seq[Expression]) => {
        require(args.length == 6,
          "graft_semantic_dedup(table, idCol, vecCol, k, iters, threshold) takes 6 arguments")
        require(args(3).foldable && args(4).foldable && args(5).foldable,
          "k, iters and threshold must be literals")
        graft.dedup.SemDedup.semanticDedup(tableArg(args(0)),
          strArg(args(1), "idCol"), strArg(args(2), "vecCol"),
          args(3).eval().asInstanceOf[Number].intValue(),
          args(4).eval().asInstanceOf[Number].intValue(),
          args(5).eval().asInstanceOf[Number].doubleValue())
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_collocations"),
      info("graft_collocations",
        "graft_collocations(table, textCol, minCount, k) - top-k adjacent-bigram collocations by PMI (shipped as the lift ratio): (bigram, n_xy, n_x, n_y, lift)"),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_collocations(table, textCol, minCount, k) takes 4 arguments")
        require(args(2).foldable && args(3).foldable, "minCount and k must be literals")
        graft.text.Collocations.pmiTopK(tableArg(args(0)),
          strArg(args(1), "textCol"),
          args(2).eval().asInstanceOf[Number].longValue(),
          args(3).eval().asInstanceOf[Number].intValue())
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_anomaly"),
      info("graft_anomaly",
        "graft_anomaly(table, groupCol, xCol, yCol, window) - integer-exact trailing-window 2-sigma anomaly flags over an integer series: the series + (n_win, flag)"),
      (args: Seq[Expression]) => {
        require(args.length == 5,
          "graft_anomaly(table, groupCol, xCol, yCol, window) takes 5 arguments")
        require(args(4).foldable, "window must be a literal")
        graft.ops.Trend.anomalyFlags(tableArg(args(0)),
          strArg(args(1), "groupCol"), strArg(args(2), "xCol"),
          strArg(args(3), "yCol"),
          args(4).eval().asInstanceOf[Number].intValue())
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_neyman_sample"),
      info("graft_neyman_sample",
        "graft_neyman_sample(table, groupCol, idCol, valueMicrosCol, budget) - Neyman-allocated stratified sample (budget split proportional to N_h*sigma_h over exact integer moments): the selected rows as (group, id, n_grp, t_grp)."),
      (args: Seq[Expression]) => {
        require(args.length == 5,
          "graft_neyman_sample(table, groupCol, idCol, valueMicrosCol, budget) takes 5 arguments")
        require(args(4).foldable, "budget must be a literal")
        graft.ops.Sampling.neymanSample(tableArg(args(0)),
          strArg(args(1), "groupCol"), strArg(args(2), "idCol"),
          org.apache.spark.sql.functions.col(strArg(args(3), "valueMicrosCol")),
          org.apache.spark.sql.functions.lit(
            args(4).eval().asInstanceOf[Number].longValue()))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_transitions"),
      info("graft_transitions",
        "graft_transitions(events) - per-user event-sequence Markov transition matrix over (user_id, event_type, ts, event_id): (src, dst, n, n_src, p_u = n*1e6 div n_src, exact integer)."),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_transitions(events) takes 1 argument")
        graft.streaming.EventsOps.transitions(tableArg(args(0)))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_lexical_diversity"),
      info("graft_lexical_diversity",
        "graft_lexical_diversity(table, textCol, groupCol) - per-group exact type-token ratio + Gini-impurity sufficient statistic: (group, n_tok, n_distinct, ttr_u, sum_sq)."),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "graft_lexical_diversity(table, textCol, groupCol) takes 3 arguments")
        graft.text.TextAnalysis.lexicalDiversity(tableArg(args(0)),
          strArg(args(1), "textCol"), strArg(args(2), "groupCol"))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_vocab_drift"),
      info("graft_vocab_drift",
        "graft_vocab_drift(tableA, tableB, textCol, topK) - token-distribution drift between two corpora as exact total-variation sufficient statistics: top-k (tok, n_a, n_b, drift = |n_a*B - n_b*A|) + a '__tvd' summary row."),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_vocab_drift(tableA, tableB, textCol, topK) takes 4 arguments")
        require(args(3).foldable, "topK must be a literal")
        graft.text.TextAnalysis.vocabDrift(tableArg(args(0)), tableArg(args(1)),
          strArg(args(2), "textCol"),
          args(3).eval().asInstanceOf[Number].intValue())
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_join_size"),
      info("graft_join_size",
        "graft_join_size(tableA, keyColA, tableB, keyColB, depth, width) - count-min inner-product join-size estimate per depth row (i, est as exact decimal); min(est) is the estimator, always >= the true |A join B| on the key."),
      (args: Seq[Expression]) => {
        require(args.length == 6,
          "graft_join_size(tableA, keyColA, tableB, keyColB, depth, width) takes 6 arguments")
        require(args(4).foldable && args(5).foldable, "depth and width must be literals")
        val depth = args(4).eval().asInstanceOf[Number].intValue()
        val width = args(5).eval().asInstanceOf[Number].intValue()
        val ca = graft.ops.Sketches.cmsCounters(tableArg(args(0)),
          org.apache.spark.sql.functions.col(strArg(args(1), "keyColA")),
          org.apache.spark.sql.functions.lit(1L), depth, width)
        val cb = graft.ops.Sketches.cmsCounters(tableArg(args(2)),
          org.apache.spark.sql.functions.col(strArg(args(3), "keyColB")),
          org.apache.spark.sql.functions.lit(1L), depth, width)
        graft.ops.Sketches.cmsJoinSizeByDepth(ca, cb).queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_profile"),
      info("graft_profile",
        "graft_profile(table) - single-pass column profile with schema-driven type routing: (col_name, n_rows, n_nulls, n_distinct, min_num, max_num, min_str, max_str)."),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_profile(table) takes 1 argument")
        graft.ops.Profile.profile(tableArg(args(0))).queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_fk_audit"),
      info("graft_fk_audit",
        "graft_fk_audit(child, keyCol, parent, parentKeyCol) - referential-integrity audit for one FK edge (parent keys must be unique): one row (fk, n_child, n_null_keys, n_orphans, min_key, max_key); NULL child keys are counted apart, never as orphans."),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_fk_audit(child, keyCol, parent, parentKeyCol) takes 4 arguments")
        val key = strArg(args(1), "keyCol"); val pk = strArg(args(3), "parentKeyCol")
        graft.ops.Profile.fkAudit(tableArg(args(0)), key, tableArg(args(2)), pk,
          s"$key->$pk").queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_acf"),
      info("graft_acf",
        "graft_acf(table, groupCol, tCol, yCol, maxLag) - per-group autocorrelation of the integral series at lags 1..maxLag: (group, k, n, acf_u = floor(1e6 * r_k)); degenerate margins dropped."),
      (args: Seq[Expression]) => {
        require(args.length == 5,
          "graft_acf(table, groupCol, tCol, yCol, maxLag) takes 5 arguments")
        require(args(4).foldable, "maxLag must be a literal")
        graft.ops.TimeSeries.acf(tableArg(args(0)), strArg(args(1), "groupCol"),
          strArg(args(2), "tCol"), strArg(args(3), "yCol"),
          args(4).eval().asInstanceOf[Number].intValue())
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_cusum"),
      info("graft_cusum",
        "graft_cusum(table, groupCol, tCol, yCol) - per-group CUSUM change-point: (group, n_obs, t_star, s_star, s_abs); S' = n*P_t - t*Sum_y, pure integer arithmetic, earliest t on ties."),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_cusum(table, groupCol, tCol, yCol) takes 4 arguments")
        graft.ops.TimeSeries.cusum(tableArg(args(0)), strArg(args(1), "groupCol"),
          strArg(args(2), "tCol"), strArg(args(3), "yCol"))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_corpus_shuffle"),
      info("graft_corpus_shuffle",
        "graft_corpus_shuffle(table, idCol, seed, nShards) - deterministic seeded corpus shuffle: (id, shard, pos) with shard = md5 shard of the id under the seed and pos = rank within the shard under an independent md5 draw; no global sort, reproducible on any engine from (seed, id)."),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_corpus_shuffle(table, idCol, seed, nShards) takes 4 arguments")
        require(args(3).foldable, "nShards must be a literal")
        graft.ops.Sampling.corpusShuffle(tableArg(args(0)), strArg(args(1), "idCol"),
          strArg(args(2), "seed"), args(3).eval().asInstanceOf[Number].intValue())
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_split_by_cluster"),
      info("graft_split_by_cluster",
        "graft_split_by_cluster(docs, idCol, pairs[, trainPct, valPct]) - leakage-safe train/val/test split: near-dup clusters (connected components of the (id_a, id_b) pairs table) are the assignment unit, so near-duplicates never straddle splits; singletons split solo. Returns (id, cluster_id, split)."),
      (args: Seq[Expression]) => {
        require(args.length == 3 || args.length == 5,
          "graft_split_by_cluster(docs, idCol, pairs[, trainPct, valPct]) takes 3 or 5 arguments")
        val (tr, va) = if (args.length == 5) {
          require(args(3).foldable && args(4).foldable,
            "trainPct and valPct must be literals")
          (args(3).eval().asInstanceOf[Number].intValue(),
            args(4).eval().asInstanceOf[Number].intValue())
        } else (80, 10)
        graft.ops.TrainingPrep.splitByCluster(tableArg(args(0)),
          strArg(args(1), "idCol"), tableArg(args(2)), tr, va)
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_profile_drift"),
      info("graft_profile_drift",
        "graft_profile_drift(tableA, tableB) - column-by-column schema/statistics drift between two snapshots: (col_name, status added/removed/ok, n_rows_a/b, null_ppm_a/b, n_distinct_a/b, range_same); full-outer on column name."),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "graft_profile_drift(tableA, tableB) takes 2 arguments")
        graft.ops.Profile.drift(tableArg(args(0)), tableArg(args(1)))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_ts_diagnose"),
      info("graft_ts_diagnose",
        "graft_ts_diagnose(table, groupCol, tCol, yCol[, anomWindow]) - one-pass series diagnostics over a shared materialized spine: (group, n_pts, slope, intercept, n_flags, acf1_u, t_star, s_star) = OLS trend + trailing-window anomaly count + lag-1 ACF + CUSUM change-point (statistic string-surfaced)."),
      (args: Seq[Expression]) => {
        require(args.length == 4 || args.length == 5,
          "graft_ts_diagnose(table, groupCol, tCol, yCol[, anomWindow]) takes 4 or 5 arguments")
        val w = if (args.length == 5) {
          require(args(4).foldable, "anomWindow must be a literal")
          args(4).eval().asInstanceOf[Number].intValue()
        } else 7
        graft.ops.TimeSeries.diagnose(tableArg(args(0)), strArg(args(1), "groupCol"),
          strArg(args(2), "tCol"), strArg(args(3), "yCol"), anomWindow = w)
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_retention"),
      info("graft_retention",
        "graft_retention(table[, epoch[, periodDays]]) - retention-cohort matrix over an events table (user_id, ts): (cohort, offset, n_users), cohort = first active period since epoch (default 2024-01-01, 7-day periods); two shuffles, no self-join."),
      (args: Seq[Expression]) => {
        require(args.length >= 1 && args.length <= 3,
          "graft_retention(table[, epoch[, periodDays]]) takes 1 to 3 arguments")
        val epoch = if (args.length >= 2) strArg(args(1), "epoch") else "2024-01-01"
        val days = if (args.length == 3) {
          require(args(2).foldable, "periodDays must be a literal")
          args(2).eval().asInstanceOf[Number].intValue()
        } else 7
        graft.streaming.EventsOps.retentionCohorts(tableArg(args(0)), epoch, days)
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_dataset_card"),
      info("graft_dataset_card",
        "graft_dataset_card(table) - release dataset card over a documents table (doc_id, source, lang, text, n_chars): per-(source, lang) + '__all' exact integers (n_docs, n_dup_docs, n_tokens, n_chars); dup = normalized fingerprint repeated globally."),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_dataset_card(table) takes 1 argument")
        graft.ops.DatasetCard.card(tableArg(args(0)))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_card_merged"),
      info("graft_card_merged",
        "graft_card_merged(table, nShards) - the dataset card computed the mergeable way: per-shard partial cards (cell sums + fp tallies, materialized) merged into the release card; identical output to graft_dataset_card at any shard count. Executes eagerly (partials land - procedure semantics)."),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "graft_card_merged(table, nShards) takes 2 arguments")
        require(args(1).foldable, "nShards must be a literal")
        val (cells, fps) = graft.ops.DatasetCard.partials(tableArg(args(0)),
          args(1).eval().asInstanceOf[Number].intValue())
        graft.ops.DatasetCard.merge(cells, fps)
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_harmonic_centrality"),
      info("graft_harmonic_centrality",
        "graft_harmonic_centrality(edges, rounds, p) - per-node harmonic centrality from HyperANF ball sketches over a directed (src, dst) edge table: (node, harmonic) with H(v) ~= Sum_r (|B(v,r)|-|B(v,r-1)|)/r; 2^p registers of state per node."),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "graft_harmonic_centrality(edges, rounds, p) takes 3 arguments")
        require(args(1).foldable && args(2).foldable, "rounds and p must be literals")
        val rounds = args(1).eval().asInstanceOf[Number].intValue()
        val p = args(2).eval().asInstanceOf[Number].intValue()
        graft.ops.HyperAnf.harmonicCentrality(tableArg(args(0)), rounds, p)
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_band_join"),
      info("graft_band_join",
        "graft_band_join(table, idCol, groupCol, valCol, eps) - all unordered within-group pairs with |v_a - v_b| <= eps via bucket-probe equi-join (never a cross product): (grp, id_a, id_b, v_a, v_b, diff)."),
      (args: Seq[Expression]) => {
        require(args.length == 5,
          "graft_band_join(table, idCol, groupCol, valCol, eps) takes 5 arguments")
        require(args(4).foldable, "eps must be a literal")
        graft.ops.BandJoin.pairs(tableArg(args(0)), strArg(args(1), "idCol"),
          strArg(args(2), "groupCol"), strArg(args(3), "valCol"),
          args(4).eval().asInstanceOf[Number].doubleValue())
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_debounce"),
      info("graft_debounce",
        "graft_debounce(table, epsSec) - burst-collapse debounce over an events table (user_id, event_type, ts, event_id): input rows + (burst_id, kept); only each burst's first event has kept = true."),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_debounce(table, epsSec) takes 2 arguments")
        require(args(1).foldable, "epsSec must be a literal")
        graft.streaming.EventsOps.debounce(tableArg(args(0)),
          args(1).eval().asInstanceOf[Number].longValue())
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_mmr"),
      info("graft_mmr",
        "graft_mmr(table, vecCol, idCol, queryId, shortlist, k) - maximal-marginal-relevance diversified top-k over int8-quantized embedding dots (lambda = 1/2, exact-integer greedy): (rk, n_id, rel, cut). Executes eagerly (shortlist collect - procedure semantics)."),
      (args: Seq[Expression]) => {
        require(args.length == 6,
          "graft_mmr(table, vecCol, idCol, queryId, shortlist, k) takes 6 arguments")
        require(args(3).foldable && args(4).foldable && args(5).foldable,
          "queryId, shortlist and k must be literals")
        graft.similarity.Mmr.rerank(tableArg(args(0)), strArg(args(1), "vecCol"),
          strArg(args(2), "idCol"),
          args(3).eval().asInstanceOf[Number].longValue(),
          args(4).eval().asInstanceOf[Number].intValue(),
          args(5).eval().asInstanceOf[Number].intValue())
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_hyperanf"),
      info("graft_hyperanf",
        "graft_hyperanf(edges, rounds, p) - HyperANF ball registers over an (src, dst) edge table: (r, node, regs array) for r = 0..rounds. Executes the rounds eagerly (iterative fixpoint - procedure semantics)."),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_hyperanf(edges, rounds, p) takes 3 arguments")
        require(args(1).foldable && args(2).foldable, "rounds and p must be literals")
        graft.ops.HyperAnf.ballRegisters(tableArg(args(0)),
          args(1).eval().asInstanceOf[Number].intValue(),
          args(2).eval().asInstanceOf[Number].intValue())
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_trend"),
      info("graft_trend",
        "graft_trend(table, groupCol, xCol, yCol) - per-group least-squares line over integer points: (group, n_pts, slope, intercept)"),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_trend(table, groupCol, xCol, yCol) takes 4 arguments")
        graft.ops.Trend.linearTrend(tableArg(args(0)),
          strArg(args(1), "groupCol"), strArg(args(2), "xCol"),
          strArg(args(3), "yCol"))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_hll_distinct"),
      info("graft_hll_distinct",
        "graft_hll_distinct(table, groupCol, keyCol, p) - per-group HyperLogLog distinct-count sketch summary (2^p registers, engine-portable md5 hashing): (group, regs, v_zero, s_u, est)"),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_hll_distinct(table, groupCol, keyCol, p) takes 4 arguments")
        require(args(3).foldable, "p must be a literal")
        val grp = strArg(args(1), "groupCol")
        val p = args(3).eval().asInstanceOf[Number].intValue()
        graft.ops.Sketches.hllSummary(
          graft.ops.Sketches.hllRegisters(tableArg(args(0)), grp,
            org.apache.spark.sql.functions.col(strArg(args(2), "keyCol")), p),
          grp, p)
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_count_min"),
      info("graft_count_min",
        "graft_count_min(table, keyCol, depth, width) - count-min frequency counters over the key column (weight 1 per row, mergeable by addition): (i, bucket, c)"),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_count_min(table, keyCol, depth, width) takes 4 arguments")
        require(args(2).foldable && args(3).foldable,
          "depth and width must be literals")
        graft.ops.Sketches.cmsCounters(tableArg(args(0)),
          org.apache.spark.sql.functions.col(strArg(args(1), "keyCol")),
          org.apache.spark.sql.functions.lit(1L),
          args(2).eval().asInstanceOf[Number].intValue(),
          args(3).eval().asInstanceOf[Number].intValue())
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_label_prop"),
      info("graft_label_prop",
        "graft_label_prop(table, srcCol, dstCol, iters) - synchronous label-propagation communities over an integral edge list: (node, label)"),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_label_prop(table, srcCol, dstCol, iters) takes 4 arguments")
        require(args(3).foldable, "iters must be a literal")
        graft.ops.LabelProp.run(tableArg(args(0)),
          strArg(args(1), "srcCol"), strArg(args(2), "dstCol"),
          args(3).eval().asInstanceOf[Number].intValue())
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_containment_join"),
      info("graft_containment_join",
        "graft_containment_join(table, textCol, idCol, threshold, minGrams) - directed shingle-containment join (excerpt/quote detection): (id_a, id_b, containment) with |S(a)&S(b)|/|S(a)| >= threshold, id_a != id_b"),
      (args: Seq[Expression]) => {
        require(args.length == 5,
          "graft_containment_join(table, textCol, idCol, threshold, minGrams) takes 5 arguments")
        require(args(3).foldable && args(4).foldable,
          "threshold and minGrams must be literals")
        graft.dedup.Containment.containmentJoin(tableArg(args(0)),
          strArg(args(1), "textCol"), strArg(args(2), "idCol"),
          dblArg(args(3), "threshold"),
          minGrams = args(4).eval().asInstanceOf[Number].intValue())
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_novelty"),
      info("graft_novelty",
        "graft_novelty(candTable, refTable, textCol, idCol) - per-candidate-doc fraction of distinct word bigrams unseen in the reference corpus: (id, n_bigrams, n_unseen, novelty)"),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_novelty(candTable, refTable, textCol, idCol) takes 4 arguments")
        graft.ops.TrainingPrep.noveltyScore(tableArg(args(0)), tableArg(args(1)),
          strArg(args(2), "textCol"), strArg(args(3), "idCol"))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_common_neighbors"),
      info("graft_common_neighbors",
        "graft_common_neighbors(table, srcCol, dstCol, k) - top-k src-node pairs by shared dst neighbors: (n_a, n_b, common, deg_a, deg_b, jaccard)"),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_common_neighbors(table, srcCol, dstCol, k) takes 4 arguments")
        require(args(3).foldable, "k must be a literal")
        graft.ops.CommonNeighbors.topK(tableArg(args(0)),
          strArg(args(1), "srcCol"), strArg(args(2), "dstCol"),
          args(3).eval().asInstanceOf[Number].intValue())
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_weighted_sample"),
      info("graft_weighted_sample",
        "graft_weighted_sample(table, idCol, weightCol, step) - weight-proportional systematic sample: one row per `step` units of cumulative weight in deterministic md5 order (64 strata)"),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_weighted_sample(table, idCol, weightCol, step) takes 4 arguments")
        require(args(3).foldable, "step must be a literal")
        graft.ops.Sampling.systematicWeighted(tableArg(args(0)),
          strArg(args(1), "idCol"), strArg(args(2), "weightCol"),
          args(3).eval().asInstanceOf[Number].longValue())
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_kmv_overlap"),
      info("graft_kmv_overlap",
        "graft_kmv_overlap(table, groupCol, keyCol, k) - KMV bottom-k sketches per group + all-pair overlap estimates: (grp_a, grp_b, n_common, jacc_est, inter_est)"),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_kmv_overlap(table, groupCol, keyCol, k) takes 4 arguments")
        require(args(3).foldable, "k must be a literal")
        val grp = strArg(args(1), "groupCol")
        val k = args(3).eval().asInstanceOf[Number].intValue()
        graft.ops.Sketches.kmvPairStats(
          graft.ops.Sketches.kmvSketch(tableArg(args(0)), grp,
            org.apache.spark.sql.functions.col(strArg(args(2), "keyCol")), k),
          grp, k)
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_substring_search"),
      info("graft_substring_search",
        "graft_substring_search(table, textCol, idCol, pattern) - trigram-index substring search (case-insensitive, pattern >= 3 chars): (pattern, id) matches without a corpus LIKE scan"),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_substring_search(table, textCol, idCol, pattern) takes 4 arguments")
        val df = tableArg(args(0))
        val textCol = strArg(args(1), "textCol")
        val idCol = strArg(args(2), "idCol")
        graft.text.TrigramIndex.search(
          graft.text.TrigramIndex.build(df, textCol, idCol),
          df, textCol, idCol, Seq(strArg(args(3), "pattern")))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_itemsets"),
      info("graft_itemsets",
        "graft_itemsets(table, basketCol, itemCol, minSupPerMyriad) - frequent item pairs at or above minSup/10000 relative support: (item_a, item_b, n_ab, n_a, n_b, lift)"),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_itemsets(table, basketCol, itemCol, minSupPerMyriad) takes 4 arguments")
        require(args(3).foldable, "minSupPerMyriad must be a literal")
        graft.ops.Itemsets.frequentPairs(tableArg(args(0)),
          strArg(args(1), "basketCol"), strArg(args(2), "itemCol"),
          args(3).eval().asInstanceOf[Number].longValue())
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_skyline"),
      info("graft_skyline",
        "graft_skyline(table, xCol, yCol) - 2-D skyline (Pareto frontier) minimizing xCol, maximizing yCol: the input rows no other row beats on both axes"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "graft_skyline(table, xCol, yCol) takes 3 arguments")
        graft.ops.Skyline.skyline2d(tableArg(args(0)),
          strArg(args(1), "xCol"), strArg(args(2), "yCol"))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_sssp"),
      info("graft_sssp",
        "graft_sssp(table, srcCol, dstCol, wCol, source, rounds) - Bellman-Ford shortest paths from `source` over weighted edges: (node, dist) exact among <= rounds-edge paths"),
      (args: Seq[Expression]) => {
        require(args.length == 6,
          "graft_sssp(table, srcCol, dstCol, wCol, source, rounds) takes 6 arguments")
        require(args(4).foldable && args(5).foldable,
          "source and rounds must be literals")
        val df = tableArg(args(0))
        val edges = df.select(
          org.apache.spark.sql.functions.col(strArg(args(1), "srcCol")).as("src"),
          org.apache.spark.sql.functions.col(strArg(args(2), "dstCol")).as("dst"),
          org.apache.spark.sql.functions.col(strArg(args(3), "wCol")).as("w"))
        graft.ops.Sssp.runRounds(edges,
          args(4).eval().asInstanceOf[Number].longValue(),
          args(5).eval().asInstanceOf[Number].intValue())
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_url_canonical"),
      info("graft_url_canonical",
        "graft_url_canonical(table, urlCol, idCol) - URL canonicalization + key dedup: (canonical_url, n_variants, min_doc) collapsing case/port/www/tracking-param/fragment/slash variants"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "graft_url_canonical(table, urlCol, idCol) takes 3 arguments")
        val df = tableArg(args(0))
        val f = org.apache.spark.sql.functions
        df.select(graft.text.UrlNormalize.canonicalUrl(
            f.col(strArg(args(1), "urlCol"))).as("canonical_url"),
            f.col(strArg(args(2), "idCol")).as("__id"))
          .groupBy("canonical_url")
          .agg(f.count(f.lit(1)).as("n_variants"), f.min("__id").as("min_doc"))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_cdc_chunks"),
      info("graft_cdc_chunks",
        "graft_cdc_chunks(table, textCol, idCol, w, m) - content-defined chunking (Karp-Rabin rolling hash, boundaries where the w-char window hash = 0 mod m): (id, idx, start, len, h)"),
      (args: Seq[Expression]) => {
        require(args.length == 5,
          "graft_cdc_chunks(table, textCol, idCol, w, m) takes 5 arguments")
        require(args(3).foldable && args(4).foldable, "w and m must be literals")
        graft.text.CdcChunk.chunks(tableArg(args(0)),
          strArg(args(1), "textCol"), strArg(args(2), "idCol"),
          args(3).eval().asInstanceOf[Number].intValue(),
          args(4).eval().asInstanceOf[Number].intValue())
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_chunk_dedup"),
      info("graft_chunk_dedup",
        "graft_chunk_dedup(table, textCol, idCol, w, m) - cross-document shared content-defined chunks: (h, n_docs, n_occ, len, first_doc) for chunk hashes in >= 2 docs"),
      (args: Seq[Expression]) => {
        require(args.length == 5,
          "graft_chunk_dedup(table, textCol, idCol, w, m) takes 5 arguments")
        require(args(3).foldable && args(4).foldable, "w and m must be literals")
        val f = org.apache.spark.sql.functions
        graft.text.CdcChunk.chunks(tableArg(args(0)),
            strArg(args(1), "textCol"), strArg(args(2), "idCol"),
            args(3).eval().asInstanceOf[Number].intValue(),
            args(4).eval().asInstanceOf[Number].intValue())
          .groupBy("h")
          .agg(f.countDistinct("id").as("n_docs"), f.count(f.lit(1)).as("n_occ"),
            f.min("len").as("len"), f.min("id").as("first_doc"))
          .filter(f.col("n_docs") >= 2)
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_random_walks"),
      info("graft_random_walks",
        "graft_random_walks(table, srcCol, dstCol, steps) - deterministic md5-derived truncated random walks, one per start node: (walk_id, step_1..step_N), NULL once a dangling node is reached. Executes the adjacency indexing eagerly (procedure semantics)."),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_random_walks(table, srcCol, dstCol, steps) takes 4 arguments")
        require(args(3).foldable, "steps must be a literal")
        graft.ops.RandomWalk.walks(tableArg(args(0)),
          strArg(args(1), "srcCol"), strArg(args(2), "dstCol"),
          args(3).eval().asInstanceOf[Number].intValue())
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_delta_dedup"),
      info("graft_delta_dedup",
        "graft_delta_dedup(corpusTable, deltaTable, textCol, idCol, threshold) - incremental near-dup pairs between a delta shard and the standing corpus (MinHash LSH index probe; corpus-internal pairs excluded): (id_a, id_b, jaccard). Builds the corpus index eagerly into a temp dir (procedure semantics); the Scala API (DeltaDedup.buildIndex/deltaPairs) keeps the index persistent across increments."),
      (args: Seq[Expression]) => {
        require(args.length == 5,
          "graft_delta_dedup(corpusTable, deltaTable, textCol, idCol, threshold) takes 5 arguments")
        val textCol = strArg(args(2), "textCol")
        val idCol = strArg(args(3), "idCol")
        val path = graft.Scratch.dir("graft_lsh_sql").toString
        graft.dedup.DeltaDedup.buildIndex(tableArg(args(0)), textCol, idCol, path)
        graft.dedup.DeltaDedup.deltaPairs(SparkSession.active, path,
          tableArg(args(1)), textCol, idCol, dblArg(args(4), "threshold"))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_quantile_sketch"),
      info("graft_quantile_sketch",
        "graft_quantile_sketch(table, groupCol, valueCol, qPermille) - mergeable base-2 DD-style quantile histogram over a positive-integer column: (group, q, n, est) with est the <= 2^-3-relative-error bucket lower bound at the q-permille rank"),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_quantile_sketch(table, groupCol, valueCol, qPermille) takes 4 arguments")
        require(args(3).foldable, "qPermille must be a literal")
        val grp = strArg(args(1), "groupCol")
        val bk = graft.ops.Sketches.ddBuckets(tableArg(args(0)), grp,
          org.apache.spark.sql.functions.col(strArg(args(2), "valueCol")))
        graft.ops.Sketches.ddQuantiles(bk, grp,
          Seq(args(3).eval().asInstanceOf[Number].intValue()))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_kcore"),
      info("graft_kcore",
        "graft_kcore(table, srcCol, dstCol, k) - k-core decomposition of an undirected graph (edge list carrying both directions): (node, deg) of the maximal subgraph where every node keeps degree >= k. Executes the cascading peel eagerly (iterative fixpoint - procedure semantics)."),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_kcore(table, srcCol, dstCol, k) takes 4 arguments")
        require(args(3).foldable, "k must be a literal")
        graft.ops.KCore.kcore(tableArg(args(0)),
          strArg(args(1), "srcCol"), strArg(args(2), "dstCol"),
          args(3).eval().asInstanceOf[Number].intValue())
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_scc"),
      info("graft_scc",
        "graft_scc(table, srcCol, dstCol) - strongly connected components of a directed edge list (FW-BW min-label coloring): (node, scc) with scc = min node id of the component. Executes the peel fixpoint eagerly (procedure semantics)."),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "graft_scc(table, srcCol, dstCol) takes 3 arguments")
        graft.ops.Scc.scc(tableArg(args(0)),
          strArg(args(1), "srcCol"), strArg(args(2), "dstCol"))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_temperature_sample"),
      info("graft_temperature_sample",
        "graft_temperature_sample(table, groupCol, idCol, budget) - temperature-balanced group sampling (mT5/XLM-R alpha=1/2 training mix): per-group targets t_l = min(n_l, budget*floor(sqrt(n_l)) DIV sum) with the t_l smallest md5 key hashes selected deterministically: (group, id, n_grp, t_grp)"),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_temperature_sample(table, groupCol, idCol, budget) takes 4 arguments")
        require(args(3).foldable, "budget must be a literal")
        graft.ops.Sampling.temperatureSample(tableArg(args(0)),
          strArg(args(1), "groupCol"), strArg(args(2), "idCol"),
          org.apache.spark.sql.functions.lit(
            args(3).eval().asInstanceOf[Number].longValue()))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_gopher_repetition"),
      info("graft_gopher_repetition",
        "graft_gopher_repetition(table, textCol, idCol) - Gopher repetition battery (Rae et al. 2021 Table A1) over newline-separated page text: per-row (id, n_lines, dup_line_u, dup_line_char_u, top2_u, top3_u, top4_u, dup5_u, dup10_u, keep), fractions in integer micro-units, keep = the published thresholds. Zero-shuffle per-row folds."),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "graft_gopher_repetition(table, textCol, idCol) takes 3 arguments")
        graft.text.GopherRepetition.metrics(tableArg(args(0)),
          strArg(args(1), "textCol"), strArg(args(2), "idCol"))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_robots_gate"),
      info("graft_robots_gate",
        "graft_robots_gate(robotsTable, hostCol, textCol, urlsTable, agent) - RFC 9309 robots.txt gate: parses per-host robots bodies into the MERGED rule set for `agent` (specific-agent groups beat *), then adjudicates urlsTable's (host, path) rows - longest matching rule wins, Allow breaks ties, no match = allowed: urls columns + (allowed, rule, spec). Rule arrays broadcast; the URL side never shuffles."),
      (args: Seq[Expression]) => {
        require(args.length == 5,
          "graft_robots_gate(robotsTable, hostCol, textCol, urlsTable, agent) takes 5 arguments")
        val rules = graft.text.RobotsTxt.agentRules(tableArg(args(0)),
          strArg(args(1), "hostCol"), strArg(args(2), "textCol"),
          strArg(args(4), "agent"))
        graft.text.RobotsTxt.adjudicate(tableArg(args(3)), rules)
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_sitemap_seeds"),
      info("graft_sitemap_seeds",
        "graft_sitemap_seeds(sitemapTable, hostCol, xmlCol, visitedTable) - sitemaps.org seed discovery: harvest <url> blocks from per-host sitemap XML (loc required, lastmod optional, unknown fields skipped), canonicalize the locations, and drop seeds already in visitedTable(canonical_url) via bloom prune + broadcast exact kill: (host, canonical_url, lastmod)."),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_sitemap_seeds(sitemapTable, hostCol, xmlCol, visitedTable) takes 4 arguments")
        graft.text.Sitemap.seeds(
          graft.text.Sitemap.entries(tableArg(args(0)),
            strArg(args(1), "hostCol"), strArg(args(2), "xmlCol")),
          tableArg(args(3)))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_ccnet_bucket"),
      info("graft_ccnet_bucket",
        "graft_ccnet_bucket(table, textCol, idCol, langCol) - CCNet perplexity bucketing (Wenzek et al. 2020): per-language bigram-LM perplexity in integer micro-nats, bucketed head/middle/tail at each language's terciles computed from a fixed-width histogram (cut bins broadcast back - never an ntile over the corpus): (id, lang, n_bigrams, ppl_u, bucket)."),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_ccnet_bucket(table, textCol, idCol, langCol) takes 4 arguments")
        graft.text.CcNetBucket.buckets(tableArg(args(0)),
          strArg(args(1), "textCol"), strArg(args(2), "idCol"),
          strArg(args(3), "langCol"))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_dsir_weights"),
      info("graft_dsir_weights",
        "graft_dsir_weights(table, textCol, idCol, targetPredicate) - DSIR importance weights (Xie et al. 2023): hashed-bigram bucket distributions (raw vs the rows matching targetPredicate, a SQL boolean expression string), per-doc weight = exact sum of integerized per-bucket log-ratios: (id, n_feats, w_u, keep) with keep = w_u > 0."),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_dsir_weights(table, textCol, idCol, targetPredicate) takes 4 arguments")
        graft.ops.TrainingPrep.dsirWeights(tableArg(args(0)),
          strArg(args(1), "textCol"), strArg(args(2), "idCol"),
          org.apache.spark.sql.functions.expr(strArg(args(3), "targetPredicate")))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_url_blocklist"),
      info("graft_url_blocklist",
        "graft_url_blocklist(urlsTable, blocklistTable) - UT1-style domain blocklist gate with subdomain inheritance (bad.example bans ads.bad.example, never notbad.example): urls columns + (host, blocked, matched). Depth-bounded suffix columns broadcast-joined against blocklistTable(domain) - zero shuffles."),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "graft_url_blocklist(urlsTable, blocklistTable) takes 2 arguments")
        graft.text.UrlBlocklist.adjudicate(tableArg(args(0)), tableArg(args(1)))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_anchor_terms"),
      info("graft_anchor_terms",
        "graft_anchor_terms(pagesTable, htmlCol, k) - anchor-text harvest: top-k anchor terms per canonical link target from <a> elements (inner markup stripped, targets canonicalized), counts map-side combined, top-k through the scored_top_k bounded heap: (canonical_url, rk, term, cnt, n_terms)."),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "graft_anchor_terms(pagesTable, htmlCol, k) takes 3 arguments")
        graft.text.AnchorText.topTerms(tableArg(args(0)),
          strArg(args(1), "htmlCol"),
          args(2).eval().asInstanceOf[Number].intValue())
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_hits"),
      info("graft_hits",
        "graft_hits(edgesTable, nIters) - HITS hubs & authorities (Kleinberg 1999) over directed (src, dst) edges: all-integer max-normalized rounds (ranking order equals the L2 variant), scores in micro-units of each round's best: (node, auth_u, hub_u)."),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "graft_hits(edgesTable, nIters) takes 2 arguments")
        graft.ops.Hits.run(tableArg(args(0)),
          args(1).eval().asInstanceOf[Number].intValue())
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_nb_classifier"),
      info("graft_nb_classifier",
        "graft_nb_classifier(table, textCol, idCol, posPredicate, negPredicate) - seed-trained Naive-Bayes quality classifier (the GPT-3-recipe selection family): fit = one map-side-combined histogram over the labeled seed's hashed unigrams (predicates are SQL boolean expression strings), log-odds in integer micro-nats, score = prior + exact per-doc sum, keep = score > 0 (the MAP boundary): (id, n_toks, score_u, keep)."),
      (args: Seq[Expression]) => {
        require(args.length == 5,
          "graft_nb_classifier(table, textCol, idCol, posPredicate, negPredicate) takes 5 arguments")
        graft.ops.TrainingPrep.nbClassifierScore(tableArg(args(0)),
          strArg(args(1), "textCol"), strArg(args(2), "idCol"),
          org.apache.spark.sql.functions.expr(strArg(args(3), "posPredicate")),
          org.apache.spark.sql.functions.expr(strArg(args(4), "negPredicate")))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_delta_triangles"),
      info("graft_delta_triangles",
        "graft_delta_triangles(standingTable, deltaTable) - incremental triangle counting over undirected (a, b) edges: per-node counts of triangles the delta batch CREATES (== recount(union) - recount(standing), node for node), enumerated delta-anchored so the standing wedge join never re-runs: (node, n_new). Counts merge by addition into a standing per-node table."),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "graft_delta_triangles(standingTable, deltaTable) takes 2 arguments")
        graft.ops.Triangles.deltaPerNode(tableArg(args(0)), tableArg(args(1)))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_hard_negatives"),
      info("graft_hard_negatives",
        "graft_hard_negatives(corpusTable, anchorsTable, vecCol, idCol, labelCol, k) - hard-negative mining (the DPR recipe): per anchor, the k most-cosine-similar corpus vectors with a DIFFERENT label (label = the positive-equivalence key), anchors broadcast, corpus streamed through the bounded scored_top_k heap: (q_id, rk, n_id)."),
      (args: Seq[Expression]) => {
        require(args.length == 6,
          "graft_hard_negatives(corpusTable, anchorsTable, vecCol, idCol, labelCol, k) takes 6 arguments")
        graft.similarity.Ann.hardNegatives(tableArg(args(0)), tableArg(args(1)),
          strArg(args(2), "vecCol"), strArg(args(3), "idCol"),
          strArg(args(4), "labelCol"),
          args(5).eval().asInstanceOf[Number].intValue())
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_mojibake_repair"),
      info("graft_mojibake_repair",
        "graft_mojibake_repair(table, textCol, idCol) - ftfy-class encoding repair: chars re-encoded as Latin-1 bytes, re-decoded as UTF-8 iff the byte image is valid RFC 3629 UTF-8 (nested mis-decodes peel one layer per step; genuine Latin-1 refused by the validator): (id, n_fixes, n_chars_in, n_chars_out, fp) with fp = md5 of the repaired text."),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "graft_mojibake_repair(table, textCol, idCol) takes 3 arguments")
        val t = tableArg(args(0))
        graft.text.Mojibake.repair(t.sparkSession, t,
          strArg(args(1), "textCol"), strArg(args(2), "idCol"))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_delta_components"),
      info("graft_delta_components",
        "graft_delta_components(standingMapTable, deltaPairsTable) - incremental connected components: fold a delta batch's (id_a, id_b) pairs into a standing (id, cluster_id) component map without re-running the corpus fixpoint (endpoints probe the map by broadcast semi-join, the fixpoint runs over the delta-sized rep graph): (node, old_rep, new_rep) for every node whose label changes - apply as a keyed upsert."),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "graft_delta_components(standingMapTable, deltaPairsTable) takes 2 arguments")
        graft.dedup.Dedup.deltaComponents(tableArg(args(0)), tableArg(args(1)))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_langid"),
      info("graft_langid",
        "graft_langid(table, textCol, idCol, langCol, seedPredicate) - supervised language id: multinomial NB over hashed char trigrams fit on the rows matching seedPredicate (a SQL boolean expression string), every row classified: (id, n_grams, pred_lang, score_u). Exact integer micro-nats; argmax ties to the smallest language."),
      (args: Seq[Expression]) => {
        require(args.length == 5,
          "graft_langid(table, textCol, idCol, langCol, seedPredicate) takes 5 arguments")
        graft.ops.TrainingPrep.langidClassify(tableArg(args(0)),
          strArg(args(1), "textCol"), strArg(args(2), "idCol"),
          strArg(args(3), "langCol"),
          org.apache.spark.sql.functions.expr(strArg(args(4), "seedPredicate")))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_crossmodal_qc"),
      info("graft_crossmodal_qc",
        "graft_crossmodal_qc(pairsTable, aCol, bCol, idCol) - cross-modal pair consistency QC (the LAION-class caption<->image filter): both embedding columns int8-quantize, then integer dot/norms and one integer division yield the signed micro-cosine^2: (id, dot_q, na2, nb2, cons_u, keep) with keep at cons_u >= 810000 (cos 0.9)."),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_crossmodal_qc(pairsTable, aCol, bCol, idCol) takes 4 arguments")
        graft.multimodal.MultimodalPipeline.crossModalQc(tableArg(args(0)),
          strArg(args(1), "aCol"), strArg(args(2), "bCol"),
          strArg(args(3), "idCol"))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("graft_host_rollup"),
      info("graft_host_rollup",
        "graft_host_rollup(table, urlCol, flagCol, textCol, banAbove) - host-level adjudication (the RefinedWeb-class per-domain rollup that discovers what graft_url_blocklist enforces): per host (lowercased, www/default-port stripped; subdomains stay distinct) the doc count, flagged count, total chars, flagged fraction, and the ban verdict at banAbove."),
      (args: Seq[Expression]) => {
        require(args.length == 5,
          "graft_host_rollup(table, urlCol, flagCol, textCol, banAbove) takes 5 arguments")
        graft.ops.HostStats.rollup(tableArg(args(0)), strArg(args(1), "urlCol"),
          strArg(args(2), "flagCol"), strArg(args(3), "textCol"),
          dblArg(args(4), "banAbove"))
          .queryExecution.logical
      }))

    // whole-operator path: plans CosineTopKPlan nodes
    ext.injectPlannerStrategy(_ => CosineTopKStrategy)

    // conf-gated rewrite: COUNT(DISTINCT x) -> HLL++ sketch
    ext.injectOptimizerRule(session => ApproxDistinctRule(session))
  }
}
