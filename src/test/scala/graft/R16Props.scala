package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.ops.{SimilarityOps, SplitOps, TextOps}

/** Round-16 properties: the packing / curriculum / hard-negative tier
  * against local references and their defining invariants on random
  * inputs. */
object R16Props extends Properties("round16") {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6).withWorkers(1)

  private val sizesGen = for {
    n <- Gen.choose(5, 60)
    cap <- Gen.choose(50L, 200L)
    sizes <- Gen.listOfN(n, Gen.choose(1L, cap))
  } yield (cap, sizes)

  /** Classic sequential FFD — the local reference the distributed
    * single-group form must trace exactly. */
  private def ffdLocal(sizes: Seq[(Long, Long)], cap: Long)
      : Map[Long, Long] = {
    val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
    sizes.sortBy { case (id, n) => (-n, id) }.map { case (id, n) =>
      var b = 0
      while (b < fills.length && fills(b) + n > cap) b += 1
      if (b == fills.length) fills += n else fills(b) += n
      id -> b.toLong
    }.toMap
  }

  property("packBinsFfd(numGroups = 1) traces classic sequential FFD") =
    forAll(sizesGen) { case (cap, sizes) =>
      val withIds = sizes.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      val df = withIds.toDF("doc_id", "n_tokens")
      val out = TextOps.packBinsFfd(df, col("n_tokens"), col("doc_id"),
          cap, numGroups = 1)
        .select("doc_id", "bin_in_group").as[(Long, Long)].collect().toMap
      out == ffdLocal(withIds, cap)
    }

  property("packBinsShelf: closed form, capacity, bijection") =
    forAll(sizesGen) { case (cap, sizes) =>
      val withIds = sizes.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      val df = withIds.toDF("doc_id", "n_tokens")
      val out = TextOps.packBinsShelf(df, col("n_tokens"), col("doc_id"),
          cap)
        .select("doc_id", "n_tokens", "size_class", "bin_in_class", "slot")
        .as[(Long, Long, Long, Long, Long)].collect()
      // local closed-form reference: rank within class by id
      val byClass = withIds.groupBy { case (_, n) => cap / n }
      val expect = byClass.flatMap { case (q, ds) =>
        ds.sortBy(_._1).zipWithIndex.map { case ((id, n), r) =>
          id -> (q, r.toLong / q, r.toLong % q)
        }
      }
      val fills = out.groupBy(r => (r._3, r._4)).map(_._2.map(_._2).sum)
      out.length == withIds.length &&
        fills.forall(_ <= cap) &&
        out.forall { case (id, _, q, b, s) => expect(id) == ((q, b, s)) }
    }

  property("curriculumOrder: distinct keys, balanced buckets, ramp order") =
    forAll(for {
      n <- Gen.choose(4, 80)
      b <- Gen.choose(1, 8)
      scores <- Gen.listOfN(n, Gen.choose(0, 1000))
    } yield (b, scores)) { case (nb, scores) =>
      val df = scores.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("doc_id", "s")
      val out = SplitOps.curriculumOrder(df, col("s"), col("doc_id"), nb)
        .select("doc_id", "bucket", "pos_in_bucket", "sched_key")
        .as[(Long, Long, Long, Long)].collect()
      val n = scores.length
      val sizes = out.groupBy(_._2).view.mapValues(_.length).values.toSeq
      // rank order: easy (low score) first, ties by id
      val rankOf = scores.zipWithIndex
        .map { case (s, i) => (s, i.toLong) }.sorted.map(_._2)
        .zipWithIndex.toMap
      out.length == n &&
        out.map(_._4).distinct.length == n &&
        sizes.max - sizes.min <= 1 &&
        out.forall { case (id, b, _, _) =>
          b == rankOf(id).toLong * nb / n } &&
        // within a bucket, sched_key order == difficulty order
        // (.toSeq: collect() gives Arrays, whose == is reference identity)
        out.groupBy(_._2).forall { case (_, rows) =>
          val bySched = rows.sortBy(_._4).map(r => rankOf(r._1)).toSeq
          bySched == bySched.sorted
        }
    }

  property("PNG decode: EVERY single-byte corruption throws, never " +
    "silently misreads") =
    forAll(for {
      w <- Gen.choose(2, 6); h <- Gen.choose(2, 6)
      ct <- Gen.oneOf(0, 2); f <- Gen.choose(0, 4)
      il <- Gen.oneOf(true, false) // Adam7 and sequential containers
      pos <- Gen.choose(0, 10000); bit <- Gen.choose(0, 7)
    } yield (w, h, ct, f, il, pos, bit)) { case (w, h, ct, f, il, pos, bit) =>
      val ok = graft.ops.ImageCodec.encodePng(w, h, (x, y) => {
        val v = (x * 29 + y * 53 + 7) % 256; (v, v, v)
      }, ct, f, il)
      val bad = ok.clone()
      val p = pos % ok.length
      bad(p) = (bad(p) ^ (1 << bit)).toByte
      // the signature check or a chunk CRC catches every flip — a codec
      // that silently misreads any byte would poison every fingerprint
      try { graft.ops.ImageCodec.decode(bad); false }
      catch { case _: IllegalArgumentException => true
              case _: Exception => true }
    }

  private val labeledVecs = for {
    n <- Gen.choose(8, 40)
    k <- Gen.choose(1, 6)
    seed <- Gen.choose(0L, 9999L)
  } yield (n, k, seed)

  property("hardNegatives: never same-label, dense ranks, exact count") =
    forAll(labeledVecs) { case (n, k, seed) =>
      val rnd = new scala.util.Random(seed)
      val rows = (0 until n).map(i => (i.toLong,
        Seq.fill(6)((rnd.nextDouble() * 2 - 1).toFloat), i % 3))
      val e = rows.toDF("vec_id", "embedding", "label")
      val q = e.where(col("vec_id") === 0)
      val out = SimilarityOps.hardNegatives(e, col("embedding"),
          col("vec_id"), col("label"), q, col("embedding"), col("vec_id"),
          col("label"), k)
        .select("neighbor_id", "rank").as[(Long, Long)].collect()
        .sortBy(_._2)
      val negLabels = rows.filter(r => r._1 != 0L && r._3 != 0).map(_._1)
      out.length == math.min(k, negLabels.size) &&
        out.map(_._2).toSeq == (0L until out.length.toLong) &&
        out.forall { case (id, _) => negLabels.contains(id) }
    }
}
