package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.build.{IndexBuilder, IndexConfig}
import graft.model.CodeDoc
import graft.query.Searcher
import graft.table.IndexTables

/** Physical-plan quality gates: the layouts/pushdowns we rely on at
  * scale must actually appear in the plan (a correct-but-full-scan
  * query would silently pass result tests). */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val diskIndex = {
    val dir = Files.createTempDirectory("graft_plan").toString
    val docs = (0 until 300).map(i =>
      CodeDoc("r", s"f$i", "c", "scala", s"alpha beta id$i gamma merge"))
    val idx = IndexBuilder.fromCodeDocs(spark, docs.toDS(),
      IndexConfig(shardSizeDocs = 128))
    IndexTables.write(spark, idx, dir)
    IndexTables.load(spark, dir)
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("term lookup pushes field+term predicates into the parquet scan") {
    val s = new Searcher(spark, diskIndex)
    val plan = planOf(s.postingRows(Seq("merge")).toDF())
    assert(plan.contains("PushedFilters"), plan.take(500))
    assert(plan.contains("EqualTo(field,content)")
      || plan.contains("IsNotNull(term)"), plan.take(1500))
    // column pruning: the scan must NOT read the blob payload for
    // a dictionary-only projection
    val dictPlan = planOf(diskIndex.postings.select("field", "term", "df")
      .where(org.apache.spark.sql.functions.col("term") === "merge"))
    assert(!dictPlan.contains("blob"), dictPlan.take(1500))
  }

  test("top-k compiles to TakeOrderedAndProject (no full sort)") {
    val s = new Searcher(spark, diskIndex)
    val plan = planOf(s.topK(Seq("merge", "alpha"), 5))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
  }

  test("docs fetch after rank is a broadcast join of the tiny hit set") {
    val s = new Searcher(spark, diskIndex)
    val fetched = s.fetch(s.topK(Seq("merge"), 3), Seq("path"))
    fetched.collect() // run with AQE so the final plan materializes
    val plan = fetched.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      plan.take(2000))
  }

  // ---- pipeline scale gates ----

  private lazy val pipelineDocs = {
    val rows = (0L until 60L).map { i =>
      (i, s"alpha beta gamma delta tok$i epsilon zeta eta theta common words here")
    }
    rows.toDF("doc_id", "text")
  }

  test("simhash pairs plan has no cartesian / nested-loop join") {
    val df = graft.pipeline.TextPipeline.simhashPairs(pipelineDocs, 8)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("pipeline id-assignment plans have no single-partition Window") {
    for (df <- Seq(
        graft.pipeline.TextPipeline.fingerprint(pipelineDocs),
        graft.pipeline.TextPipeline.minhashCandidates(pipelineDocs),
        graft.pipeline.TextPipeline.simhash(pipelineDocs))) {
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      // a global Window shows up as Window over SinglePartition exchange
      assert(!plan.contains("Window"), plan.take(2000))
    }
  }

  test("WAND doc-length side is pruned to touched shards") {
    val s = new Searcher(spark, diskIndex)
    val df = s.topKWand(Seq("merge"), 5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // small touched sets prune via a codegen In-filter on the computed
    // shard column (no job, no join); large sets fall back to a
    // broadcast LeftSemi against a local relation
    assert(plan.contains(" IN ") || plan.contains("INSET")
      || plan.contains("LeftSemi"), plan.take(3000))
  }

  test("tombstoned index keeps pushdown and plans deletes as an anti-join") {
    val idx = diskIndex.withDeletes(Seq(1L, 2L).toDF("docId"))
    val s = new Searcher(spark, idx)
    val df = s.topK(Seq("merge"), 5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // postings scan still term-pruned; deletes enter as LeftAnti (no
    // cartesian, no filter-after-collect)
    assert(plan.contains("PushedFilters"), plan.take(2000))
    assert(plan.contains("LeftAnti"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"))
    val wdf = s.topKWand(Seq("merge"), 5)
    wdf.collect()
    val wplan = wdf.queryExecution.executedPlan.toString
    assert(wplan.contains("LeftAnti"), wplan.take(3000))
  }

  test("grouped top-k plans a WindowGroupLimit; facet docs side is shard-pruned") {
    val s = new Searcher(spark, diskIndex)
    val g = s.groupedTopK(Seq("merge"), "lang", 2)
    g.collect()
    val gplan = g.queryExecution.executedPlan.toString
    // row_number + rank<=k must trigger Spark's group-limit rewrite:
    // each map task forwards at most k rows per group into the window
    // shuffle instead of the full scored match set
    assert(gplan.contains("WindowGroupLimit"), gplan.take(2000))
    // facet on a RARE term: the stored-docs side must carry the shard
    // prune filter AND stream through a broadcast semi-join of the
    // match set (Σ df is under the gate) — the corpus-sized label scan
    // never shuffles for a selective facet
    val f = s.facetCounts(Seq("id7"), "lang", 5)
    f.collect()
    val fplan = f.queryExecution.executedPlan.toString
    assert(fplan.contains("shard"), fplan.take(2000))
    assert(fplan.contains("BroadcastHashJoin"), fplan.take(2000))
  }

  test("whole-stage codegen covers the scoring pipeline") {
    val s = new Searcher(spark, diskIndex)
    val df = s.scoredDocs(Seq("merge"), graft.query.BM25())
    df.collect() // AQE finalizes the plan only at execution
    // "*(n)" is the WholeStageCodegen marker in plan toString; the
    // BM25 arithmetic must live inside a codegen'd Project stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan.take(1500))
    assert("\\*\\(\\d+\\) Project \\[.*ln".r.findFirstIn(plan).isDefined
      || plan.contains("WholeStageCodegen"), plan.take(1500))
  }
}
