package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{ColumnProfile, PiiLevel, SemanticType}
import graft.vault.DdlGen

/** Fuzz of the Data Vault DDL generator (VERDICT r12 ask #4): random entity
  * names, schemas (types drawn across the whole sqlTypeName mapping including
  * the VARCHAR fallbacks), null-count patterns, PII levels and mask
  * thresholds — generated DDL is then checked against INDEPENDENT validators:
  *
  *   1. every CREATE TABLE / CREATE VIEW string must parse under Spark's own
  *      SQL parser (an independent grammar — catches unbalanced parens,
  *      broken type names, misplaced commas that string assembly can
  *      produce on inputs the hand-written spec never tried);
  *   2. structural invariants recomputed from the INPUTS, not the output:
  *      NOT NULL appears for exactly the measured-zero-null columns, the
  *      masked view masks exactly the columns at/above the threshold with
  *      the type-correct rendering, declared column order survives, DV
  *      metadata columns sit in fixed trailing position;
  *   3. regeneration is bit-identical (the determinism contract BASELINE
  *      relies on for the dv_ddl hash gate).
  */
class DdlGenFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val typePool: Seq[DataType] = Seq(
    LongType, IntegerType, ShortType, ByteType, DoubleType, FloatType,
    StringType, BooleanType, DateType, TimestampType, DecimalType(18, 2),
    DecimalType(7, 3), BinaryType, ArrayType(FloatType),
    MapType(StringType, LongType), StructType(Seq(StructField("x", LongType))))

  private val piiPool = Seq(PiiLevel.None, PiiLevel.Low, PiiLevel.Medium, PiiLevel.High)

  private def word(rnd: scala.util.Random): String =
    (0 until 3 + rnd.nextInt(5)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString

  test("vaultDdl on 12 random schemas: Spark-parseable, input-derived invariants, deterministic") {
    for (seed <- 1L to 12L) {
      val rnd    = new scala.util.Random(seed * 271)
      val entity = s"e${word(rnd)}"
      val nCols  = 2 + rnd.nextInt(6)
      // c<i>_ prefix: unique, never a SQL reserved word
      val cols = (0 until nCols).map(i => s"c${i}_${word(rnd)}")
      val types = cols.map(_ => typePool(rnd.nextInt(typePool.length)))
      val nullCounts = cols.map(_ => if (rnd.nextBoolean()) 0L else 1L + rnd.nextInt(100))
      val piis = cols.map(_ => piiPool(rnd.nextInt(piiPool.length)))
      val minLevel = Seq(PiiLevel.Low, PiiLevel.Medium, PiiLevel.High)(rnd.nextInt(3))

      val schema = StructType(cols.zip(types).map { case (c, t) => StructField(c, t) })
      val df = spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)
      val profiles = cols.indices.map { i =>
        ColumnProfile(cols(i), cols(i), SemanticType.Text,
          nullCount = nullCounts(i), piiLevel = piis(i))
      }
      val keyCols  = Seq(cols.head)
      val attrCols = cols.tail
      val linkName = s"l${word(rnd)}"
      val members  = Seq(entity -> cols.head, s"x${word(rnd)}" -> cols.last)

      val out = DdlGen.vaultDdl(spark, df, profiles, entity, keyCols, attrCols,
        linkDf = df, linkProfiles = profiles, linkName = linkName,
        linkMembers = members, minMaskLevel = minLevel)
      val rows = out.collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
      assert(rows.keySet == Set(s"hub_$entity", s"link_$linkName", s"sat_$entity",
        s"sat_${entity}_masked"), s"seed=$seed")

      val parser = spark.sessionState.sqlParser
      rows.values.foreach { case (_, ddl) =>
        assert(!ddl.contains("\n"), s"seed=$seed: multi-line DDL: $ddl")
        // The DDL targets the ANSI/DuckDB dialect; two type names have no
        // Spark-parser spelling, so they map to Spark's equivalents for the
        // grammar check only (the strings under test stay untouched).
        // unlengthed VARCHAR is ANSI/DuckDB-legal but Spark demands VARCHAR(n)
        val sparkDialect = ddl.replace(" BLOB", " BINARY").replace(" REAL", " FLOAT")
          .replaceAll(" VARCHAR(?!\\()", " STRING")
        parser.parsePlan(sparkDialect) // independent grammar check; throws on bad DDL
      }

      // NOT NULL iff measured null_count == 0, recomputed from the inputs
      val satDdl = rows(s"sat_$entity")._2
      attrCols.zipWithIndex.foreach { case (c, _) =>
        val i = cols.indexOf(c)
        val expectDef = s"$c ${DdlGen.sqlTypeName(types(i))}" +
          (if (nullCounts(i) == 0L) " NOT NULL" else "")
        assert(satDdl.contains(s"$expectDef,") || satDdl.contains(s"$expectDef "),
          s"seed=$seed: sat missing '$expectDef' in: $satDdl")
      }
      // declared column order survives assembly
      val positions = attrCols.map(c => satDdl.indexOf(s"$c "))
      assert(positions == positions.sorted && positions.forall(_ >= 0),
        s"seed=$seed: attr order broken in: $satDdl")
      // DV metadata columns in fixed trailing position
      assert(satDdl.contains("load_ts TIMESTAMP NOT NULL, record_source VARCHAR NOT NULL, " +
        s"PRIMARY KEY (hub_${entity}_hk, load_ts))"), s"seed=$seed: $satDdl")

      // masked view: exactly the at/above-threshold columns, type-correct rendering
      val viewDdl = rows(s"sat_${entity}_masked")._2
      attrCols.foreach { c =>
        val i = cols.indexOf(c)
        val masked = piis(i) >= minLevel
        val cell =
          if (masked) DdlGen.maskRendering(c, types(i) == DoubleType) + s" AS $c"
          else c
        assert(viewDdl.contains(s" $cell,") || viewDdl.contains(s" $cell FROM"),
          s"seed=$seed: view cell '$cell' absent in: $viewDdl")
        if (!masked)
          assert(!viewDdl.contains(s"md5(CAST($c "), s"seed=$seed: $c masked unexpectedly")
      }

      // link carries one hk per member entity plus the member key defs
      val linkDdl = rows(s"link_$linkName")._2
      members.foreach { case (e, k) =>
        assert(linkDdl.contains(s"hub_${e}_hk CHAR(64) NOT NULL"), s"seed=$seed: $linkDdl")
        assert(linkDdl.contains(s"$k ${DdlGen.sqlTypeName(types(cols.indexOf(k)))}"),
          s"seed=$seed: $linkDdl")
      }

      // regeneration is bit-identical
      val again = DdlGen.vaultDdl(spark, df, profiles, entity, keyCols, attrCols,
        linkDf = df, linkProfiles = profiles, linkName = linkName,
        linkMembers = members, minMaskLevel = minLevel)
      assert(again.collect().toSeq == out.collect().toSeq, s"seed=$seed: nondeterministic")
    }
  }
}
