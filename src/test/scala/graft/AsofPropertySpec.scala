package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.Pipeline.ModuleCfg
import graft.operators.AsofJoinTransform

/** Property suite for the batch as-of join: random corpora vs a
  * direct in-memory reference implementation of the documented
  * semantics (inclusive ties, per-side tolerance nulling, nearest's
  * backward tie preference) — the union+window plan must agree on
  * every row for every direction × tolerance combination. Right
  * (key, rt) pairs are generated unique so the matched payload is
  * well-defined (duplicate-timestamp ordinal determinism is pinned
  * separately in AsofJoinSpec). */
class AsofPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // rows: left = (id, g, t), right = (g, rt, tag)
  private def reference(left: Seq[(Int, String, Long)],
      right: Seq[(String, Long, String)], dir: String,
      tol: Option[Long]): Map[Int, Option[String]] = {
    val byKey = right.groupBy(_._1)
    left.map { case (id, g, t) =>
      val cands = byKey.getOrElse(g, Nil)
      val back = cands.filter(_._2 <= t).sortBy(_._2).lastOption
        .filter(r => tol.forall(t - r._2 <= _))
      val fwd = cands.filter(_._2 >= t).sortBy(_._2).headOption
        .filter(r => tol.forall(r._2 - t <= _))
      val pick = dir match {
        case "backward" => back
        case "forward" => fwd
        case _ => (back, fwd) match {
          case (None, f) => f
          case (b, None) => b
          case (Some(b), Some(f)) =>
            if (t - b._2 <= f._2 - t) Some(b) else Some(f)
        }
      }
      id -> pick.map(_._3)
    }.toMap
  }

  test("batch as-of matches the reference semantics on random " +
      "corpora for every direction and tolerance") {
    for (seed <- 1 to 25) {
      val rnd = new scala.util.Random(seed)
      val keys = Seq("a", "b", "c")
      val left = (1 to 40).map(i =>
        (i, keys(rnd.nextInt(3)), rnd.nextInt(100).toLong))
      // unique (key, rt): sample without replacement per key
      val right = keys.flatMap { k =>
        rnd.shuffle((0 until 100).toList).take(8 + rnd.nextInt(10))
          .map(rt => (k, rt.toLong, s"$k-$rt"))
      }
      val lDf = left.toDF("id", "g", "t")
      val rDf = right.toDF("g", "rt", "tag")
      for {
        dir <- Seq("backward", "forward", "nearest")
        tol <- Seq(None, Some(7L))
      } {
        val tolJson = tol.map(t => s""","tolerance":$t""").getOrElse("")
        val out = AsofJoinTransform.build(spark,
          ModuleCfg("aj", "asof", Seq("l", "r"), Nil,
            graft.config.Json.parse(
              s"""{"by":["g"],"leftOn":"t","rightOn":"rt",
                  "direction":"$dir"$tolJson}"""),
            graft.config.Json.obj()),
          Map("l" -> lDf, "r" -> rDf))("aj")
          .select("id", "right_tag").collect()
          .map(r => r.getInt(0) -> Option(r.getString(1))).toMap
        val exp = reference(left, right, dir, tol)
        assert(out == exp,
          s"seed=$seed dir=$dir tol=$tol:\n" +
            (out.toSeq.sorted zip exp.toSeq.sorted)
              .filter(p => p._1 != p._2).take(5).mkString("\n"))
      }
    }
  }
}
