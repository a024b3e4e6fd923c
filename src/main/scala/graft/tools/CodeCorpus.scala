package graft.tools

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.CodeDoc

/** Deterministic synthetic source-code corpus (FIXTURES.md F5) — the
  * scale/bench input mandated by the north rule (no external data).
  *
  * Every row is a pure function of (seed, i): generation runs as a
  * distributed `spark.range(n).map`, no driver-side materialization,
  * no shared RNG state — so the corpus is identical at any
  * parallelism level and any scale (the property the two-cluster-size
  * scaling run depends on).
  *
  * Content mixes: guaranteed high-frequency keywords (`public`,
  * `import`, `class`, `return` in nearly every java/scala file —
  * the skew terms of the north star), a Zipf-ish identifier
  * vocabulary (log-uniform rank over V=10000), and rare markers.
  */
object CodeCorpus {

  val Langs: Array[String] = Array("java", "scala", "py", "go")
  private val Exts = Map("java" -> "java", "scala" -> "scala", "py" -> "py", "go" -> "go")
  private val Keywords = Array("public", "import", "class", "return", "static", "void")
  private val VocabSize = 10000

  /** splitmix64 — stateless, high-quality 64-bit mix. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def h01(seed: Long, i: Long, slot: Long): Double = {
    val m = mix(seed ^ mix(i ^ mix(slot)))
    ((m >>> 11).toDouble) / (1L << 53).toDouble
  }

  /** Log-uniform ("Zipf-1-ish") identifier rank in [0, VocabSize). */
  private def zipfId(seed: Long, i: Long, slot: Long): Int = {
    val u = h01(seed, i, slot)
    math.min((math.exp(u * math.log(VocabSize.toDouble)) - 1.0).toInt, VocabSize - 1)
  }

  def doc(seed: Long, i: Long, numRepos: Int): CodeDoc = {
    val lang = Langs((mix(seed ^ i) & 0x7FFFFFFF).toInt % Langs.length)
    val repo = "repo" + (i % numRepos)
    val commit = f"${mix(seed ^ (i % numRepos)) & 0xFFFFFFFFL}%08x"
    val nTok = 50 + (mix(seed ^ i ^ 7L) & 0x7FFFFFFF).toInt % 150
    val sb = new StringBuilder(nTok * 8)
    if (lang == "java" || lang == "scala") {
      sb.append("public class F").append(i).append(" { import pkg")
        .append(i % 97).append("; ")
    } else {
      sb.append("def f").append(i).append("(): import mod")
        .append(i % 97).append(" ")
    }
    var t = 0
    while (t < nTok) {
      val r = h01(seed, i, 100L + t)
      if (r < 0.12) sb.append(Keywords((mix(seed ^ i ^ t) & 0x7FFFFFFF).toInt % Keywords.length))
      else sb.append("id").append(zipfId(seed, i, 200L + t))
      sb.append(if (t % 8 == 7) ";\n" else " ")
      t += 1
    }
    sb.append(" return x").append(i % 13).append("; }")
    CodeDoc(repo, s"src/F$i.${Exts(lang)}", commit, lang, sb.toString)
  }

  /** `parts` is EXPLICIT and fixed (not the session default
    * parallelism): the materialized table's file layout must be
    * identical no matter which session generated it — a corpus
    * written by a local[2] run would otherwise have 2 parquet files
    * (≈2 row groups), capping every later build's scan+tokenize
    * stage at ~2-way parallelism and silently wrecking the
    * two-level scaling comparison. range slices keep ids contiguous
    * per file, so docIds from file-offset metadata are unchanged. */
  def generate(spark: SparkSession, numFiles: Long,
      numRepos: Int = 100, seed: Long = 42L,
      parts: Int = 128): Dataset[CodeDoc] = {
    import spark.implicits._
    spark.range(0L, numFiles, 1L, parts).map(i => doc(seed, i, numRepos))
  }
}
