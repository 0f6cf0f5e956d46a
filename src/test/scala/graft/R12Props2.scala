package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean
import graft.ops._
import graft.functions.TopKAgg

/** Property-style invariants over randomized shapes for the session-2
  * ops (TopKAgg, GramAgg, ZOrder64, AUC, census, Gini) — real local
  * Spark plans per trial, so trial counts stay small. */
object R12Props2 extends Properties("round12b") {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6).withWorkers(1)

  property("TopKAgg == sort-based top-k on random groups/scores/k") =
    Prop.forAll(Gen.choose(1, 6), Gen.choose(30, 200),
        Gen.choose(0L, 99999L)) { (k, n, seed) =>
      val rows = (1L to n.toLong).map { i =>
        val h = (i * 2654435761L + seed) % 1000L
        (i % 5, h, i)
      }
      val topk = udaf(new TopKAgg(k))
      val got = rows.toDF("g", "score", "id").repartition(9)
        .groupBy("g").agg(topk(col("score"), col("id")).as("ids"))
        .as[(Long, Seq[Long])].collect().toMap
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        g -> rs.sortBy(r => (-r._2, r._3)).take(k).map(_._3).toSeq
      }
      got == want
    }

  property("GramAgg matches the scalar Gram on random vectors") =
    Prop.forAll(Gen.choose(2, 6), Gen.choose(5, 40),
        Gen.choose(0L, 99999L)) { (d, n, seed) =>
      val vecs = (0 until n).map { i =>
        (0 until d).map(j =>
          (((i * 31L + j * 7L + seed) % 2000L) - 1000L).toFloat / 100f)
      }
      val out = EmbedOps.gramTable(vecs.toDF("embedding"),
          col("embedding"), d)
        .as[(Int, Int, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
      val sOk = (1 to d).forall { j =>
        out((0, j)) == vecs.map(v =>
          math.floor(v(j - 1).toDouble * 1e9).toLong).sum
      }
      val qOk = (for { i <- 1 to d; j <- i to d } yield (i, j)).forall {
        case (i, j) => out((i, j)) == vecs.map(v =>
          math.floor(v(i - 1).toDouble * v(j - 1).toDouble * 1e12).toLong).sum
      }
      out((0, 0)) == n.toLong && sOk && qOk
    }

  property("zorder64 round-trips: de-interleaving recovers both inputs") =
    Prop.forAll(Gen.choose(0L, 1023L), Gen.choose(0L, 1023L)) { (a, b) =>
      val z = Seq((a, b)).toDF("a", "b")
        .select(graft.functions.ZOrder64.zorder64(col("a"), col("b"), 10))
        .as[Long].head()
      val backA = (0 until 10).map(i => ((z >> (2 * i)) & 1L) << i).reduce(_ | _)
      val backB = (0 until 10).map(i => ((z >> (2 * i + 1)) & 1L) << i).reduce(_ | _)
      backA == a && backB == b
    }

  property("exactAuc == O(n2) pair-counting reference with ties") =
    Prop.forAll(Gen.choose(6, 60), Gen.choose(0L, 99999L)) { (n, seed) =>
      val rows = (1 to n).map { i =>
        val s = (i * 2654435761L + seed) % 7L   // few scores → many ties
        val y = ((i * 40507L + seed) % 3L) == 0L
        (s, y)
      }
      val pos = rows.filter(_._2).map(_._1)
      val neg = rows.filterNot(_._2).map(_._1)
      (pos.nonEmpty && neg.nonEmpty) ==> {
        val pairs = for { p <- pos; q <- neg } yield
          if (p > q) 1.0 else if (p == q) 0.5 else 0.0
        // HALF-UP to match Spark's round() (and the DuckDB oracle) —
        // rint's half-even breaks on exact .5 ULP boundaries like 57/128
        val ref = math.floor(pairs.sum / pairs.size * 1e6 + 0.5) / 1e6
        val got = MlOps.exactAuc(rows.toDF("s", "y"), col("s"), col("y"))
          .as[(Long, Long, Double)].head()._3
        got == ref
      }
    }

  property("joinSizeCensus join_rows == materialized join count") =
    Prop.forAll(Gen.choose(10, 100), Gen.choose(0L, 9999L)) { (n, seed) =>
      val a = (1 to n).map(i => (i * 31L + seed) % 12L).toDF("k")
      val b = (1 to n).map(i => (i * 17L + seed) % 9L).toDF("k2")
      val census = JoinOps.joinSizeCensus(a, col("k"), b, col("k2")).head()
      census.getLong(1) == a.join(b, col("k") === col("k2")).count()
    }

  property("NgramStructs == the composed tokens+transform form") =
    Prop.forAll(Gen.choose(2, 3), Gen.listOfN(8,
        Gen.oneOf("alpha", "beta", "Gamma", "", " ", "\t", "x,y",
          "Ünïcode", "\n"))) { (n, parts) =>
      val text = parts.mkString(" ")
      val df = Seq(text).toDF("text")
      val native = df.select(
          explode(graft.functions.NgramStructs.ngramStructs(col("text"), n))
            .as("g"))
        .selectExpr((1 to n).map(i => s"g.w$i"): _*)
        .collect().map(_.toSeq).toSeq
      val toks = TextOps.tokens(col("text"))
      val composed = df.select(
          explode(when(size(toks) >= n,
            transform(sequence(lit(1), size(toks) - (n - 1)), i =>
              struct((0 until n).map(k =>
                element_at(toks, i + k).as(s"w${k + 1}")): _*)))
            .otherwise(array().cast(
              s"array<struct<${(1 to n).map(i => s"w$i:string").mkString(",")}>>")))
            .as("g"))
        .selectExpr((1 to n).map(i => s"g.w$i"): _*)
        .collect().map(_.toSeq).toSeq
      native == composed
    }

  property("NgramStrings == the composed wordShingles form") =
    Prop.forAll(Gen.choose(2, 4), Gen.listOfN(6,
        Gen.oneOf("alpha", "beta", "Gamma", "", " ", "\t", "x,y",
          "Ünïcode"))) { (n, parts) =>
      val text = parts.mkString(" ")
      val df = Seq(text).toDF("text")
      val native = df.select(
          graft.functions.NgramStrings.ngramStrings(col("text"), n))
        .as[Seq[String]].head()
      val composed = df.select(
          TextOps.wordShingles(TextOps.tokens(col("text")), n))
        .as[Seq[String]].head()
      native == composed
    }

  property("giniConcentration is in [0, 1) and 0 for uniform weights") =
    Prop.forAll(Gen.choose(2, 40), Gen.choose(1L, 50L)) { (n, w) =>
      val uni = (1 to n).map(i => (i, w)).toDF("k", "w")
      val g0 = EventOps.giniConcentration(uni, col("k"), col("w"))
        .as[(Long, Long, Double)].head()._3
      val skew = (1 to n).map(i => (i, if (i == 1) w * 100 else w))
        .toDF("k", "w")
      val g1 = EventOps.giniConcentration(skew, col("k"), col("w"))
        .as[(Long, Long, Double)].head()._3
      g0 == 0.0 && g1 > 0.0 && g1 < 1.0
    }
}
