package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.functions.TextFns
import graft.plans.VectorFunctions

/** Property-based checks (SURVEY.md §5.3): algebraic laws of the
  * map/reduce contract and equivalence of the fused codegen expressions
  * with their composable reference formulations. Runs under ScalaCheck's
  * own sbt test framework. */
object PropertySpec extends Properties("graft") {
  lazy val spark = TestSpark.spark

  private val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val textGen = Gen.listOf(wordGen).map(_.mkString(" "))

  property("vec_dot == HOF zip_with+aggregate, bit-for-bit") = {
    import spark.implicits._
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-100f, 100f))
    forAll(Gen.nonEmptyListOf(Gen.zip(vecGen, vecGen))) { pairs =>
      val df = pairs.map { case (a, b) => (a.toArray, b.toArray) }.toDF("a", "b")
      df.select(
        VectorFunctions.vec_dot(col("a"), col("b")).as("fused"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, v) => acc + v).as("hof"))
        .collect()
        .forall(r => r.getDouble(0) == r.getDouble(1))
    }
  }

  property("lsh_projections == one vec_dot per plane; lsh_buckets == manual bit assembly") = {
    import spark.implicits._
    val dim = 8
    val tables = 3
    val bits = 4
    val planeGen = Gen.listOfN(tables * bits * dim, Gen.chooseNum(-10.0, 10.0))
    val vecGen = Gen.listOfN(dim, Gen.chooseNum(-100f, 100f))
    forAll(Gen.zip(planeGen, Gen.nonEmptyListOf(vecGen))) { case (planesL, vecs) =>
      val planes = planesL.toArray
      val thr = Array.fill(tables * bits)(0.5)
      val rows = vecs.map(_.toArray).toDF("emb")
        .select(VectorFunctions.lsh_projections(col("emb"), planes, dim).as("p"))
        .select(col("p"),
          VectorFunctions.lsh_buckets(col("p"), array(thr.map(lit): _*), tables, bits).as("bk"))
        .collect()
      rows.zip(vecs).forall { case (r, v) =>
        val proj = r.getSeq[Double](0)
        val expectProj = (0 until tables * bits).map { p =>
          (0 until dim).foldLeft(0.0)((acc, d) => acc + v(d).toDouble * planes(p * dim + d))
        }
        val buckets = r.getSeq[Long](1)
        val expectBuckets = (0 until tables).map { t =>
          (0 until bits).foldLeft(0L)((acc, b) =>
            if (proj(t * bits + b) > thr(t * bits + b)) acc | (1L << b) else acc)
        }
        proj == expectProj && buckets == expectBuckets
      }
    }
  }

  property("word_shingle_hashes: sorted, distinct, |hs| <= max(0, tokens-2)") = {
    import spark.implicits._
    forAll(Gen.nonEmptyListOf(textGen)) { texts =>
      texts.toDF("text").select(
        VectorFunctions.word_shingle_hashes(col("text"), 3).as("hs"),
        TextFns.tokens(col("text")).as("toks"))
        .collect()
        .forall { r =>
          val hs = r.getSeq[Long](0)
          val nToks = r.getSeq[String](1).size
          hs == hs.sorted && hs.distinct.size == hs.size &&
            hs.size <= math.max(0, nToks - 2)
        }
    }
  }

  property("bucketPairs expands exactly the i<j pairs of a sorted bucket") = {
    import spark.implicits._
    val bucketGen = Gen.listOf(Gen.chooseNum(0L, 30L)).map(_.distinct.sorted)
    forAll(Gen.nonEmptyListOf(bucketGen)) { buckets =>
      val got = buckets.toDF("ids")
        .select(explode(graft.ops.Dedup.bucketPairs(col("ids"))((x, y) =>
          struct(x.as("a"), y.as("b")))).as("p"))
        .select(col("p.a"), col("p.b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val expected = buckets.flatMap(ids =>
        for (i <- ids.indices; j <- i + 1 until ids.size) yield (ids(i), ids(j))).sorted
      got == expected
    }
  }

  property("sorted_intersect_count == naive set intersection") = {
    import spark.implicits._
    val setGen = Gen.listOf(Gen.chooseNum(0L, 50L)).map(_.distinct.sorted.toArray)
    forAll(Gen.nonEmptyListOf(Gen.zip(setGen, setGen))) { pairs =>
      val got = pairs.toDF("a", "b")
        .select(VectorFunctions.sorted_intersect_count(col("a"), col("b")))
        .collect().map(_.getLong(0)).toSeq
      val expected = pairs.map { case (a, b) => a.toSet.intersect(b.toSet).size.toLong }
      got == expected
    }
  }

  property("poly_hash matches a scala code-point fold") = {
    import spark.implicits._
    forAll(Gen.nonEmptyListOf(textGen)) { texts =>
      val got = texts.toDF("t").select(VectorFunctions.poly_hash(col("t")))
        .collect().map(_.getLong(0)).toSeq
      val expected = texts.map(_.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L))
      got == expected
    }
  }

  property("cell_pairs_cosine == HOF pair expansion + vec_dot + filter, bit-for-bit") = {
    import spark.implicits._
    val vecGen = Gen.listOfN(8, Gen.chooseNum(1f, 100f)) // non-zero norm
    val itemsGen = Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, vecGen))
    forAll(Gen.zip(itemsGen, itemsGen, Gen.oneOf(true, false),
      Gen.chooseNum(-1.0, 1.0))) { case (as, bs, diag, thr) =>
      // diagonal cells require ia == ib (the operator always satisfies this)
      val bsEff = if (diag) as else bs
      val mkItems = (vs: List[List[Float]], off: Long) => vs.zipWithIndex.map { case (v, i) =>
        (off + i, v.toArray, math.sqrt(v.map(x => x.toDouble * x).sum))
      }
      val df = Seq((mkItems(as, 0L), mkItems(bsEff, if (diag) 0L else 100L)))
        .toDF("ia", "ib")
        .select(col("ia").cast("array<struct<vec_id:bigint,embedding:array<float>,nrm:double>>"),
          col("ib").cast("array<struct<vec_id:bigint,embedding:array<float>,nrm:double>>"))
      val fused = df.select(explode(
        VectorFunctions.cell_pairs_cosine(col("ia"), col("ib"), lit(diag), thr)).as("p"))
        .select("p.id_a", "p.id_b", "p.cosine")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val hofPair = (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =>
        struct(x.getField("vec_id").as("id_a"), y.getField("vec_id").as("id_b"),
          (VectorFunctions.vec_dot(x.getField("embedding"), y.getField("embedding")) /
            (x.getField("nrm") * y.getField("nrm"))).as("cosine"))
      val hofExpand =
        if (diag) flatten(transform(col("ia"), (x, i) =>
          transform(slice(col("ia"), i + lit(2), size(col("ia"))), y => hofPair(x, y))))
        else flatten(transform(col("ia"), x => transform(col("ib"), y => hofPair(x, y))))
      val hof = df.select(explode(hofExpand).as("p"))
        .filter(col("p.cosine") >= thr)
        .select("p.id_a", "p.id_b", "p.cosine")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      fused == hof
    }
  }

  property("word count invariant under line order + partitioning (MR contract)") = {
    import spark.implicits._
    forAll(Gen.nonEmptyListOf(textGen), Gen.chooseNum(1, 7)) { (lines, parts) =>
      val base = mr.MapReduce.wordCount(lines.toDS()).collect().toMap
      val shuffled = mr.MapReduce
        .wordCount(scala.util.Random.shuffle(lines).toDS().repartition(parts))
        .collect().toMap
      base == shuffled
    }
  }
}
