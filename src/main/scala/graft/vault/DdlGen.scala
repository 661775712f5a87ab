package graft.vault

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.engine.OracleGen
import graft.model.{ColumnProfile, PiiLevel}

/** Data Vault 2.0 DDL generation — the deploy-side half of [[DataVault]]:
  * deterministic CREATE TABLE / CREATE VIEW text for hub, satellite, link and
  * the PII-masked satellite view, derived from a table's Spark schema plus
  * its PROFILED column metadata. This is the reference README's headline
  * "Data Vault 2.0 Generation" (`/root/reference/README.md:2`) whose intended
  * `core/generators/` package is an empty stub — the one declared reference
  * capability the repo had no counterpart for until round 8.
  *
  * What the profile drives (the point of profiling before generating):
  *   - `null_count == 0` ⇒ `NOT NULL` on that column — measured, not assumed;
  *   - `pii_level ≥ minMaskLevel` ⇒ the satellite's masked view serves that
  *     column as `md5(canonical rendering)` ([[graft.governance.Masking]]'s
  *     tokenization rule — equal plaintexts mask to equal tokens), everything
  *     else passes through.
  *
  * Determinism contract: single-line DDL, columns in declared order, hash
  * keys as CHAR(64) (the sha256 hex of [[DataVault.hashKey]]), the DV load
  * metadata columns (`load_ts`, `record_source`) in fixed trailing position.
  * The DuckDB oracle ([[oracleVaultDdl]]) reassembles the identical strings
  * with the data-dependent terms (null_count, pii_level) recomputed by the
  * independent engine's own profile cascade — the declared query hash-checks
  * the live profiles→DDL integration, not a baked string.
  *
  * Scale shape: the only distributed work is the profiling pass itself
  * (StatsPass — one scan per table, already cached per (dir, table)); DDL
  * assembly is driver-side string work over |columns| profile rows.
  */
object DdlGen {

  /** ANSI DDL type name for a Spark column type. Types with no portable ANSI
    * name (arrays, maps, structs) declare as VARCHAR — the satellite stores
    * their canonical rendering, which is how the hashdiff already treats them.
    */
  def sqlTypeName(dt: DataType): String = dt match {
    case LongType       => "BIGINT"
    case IntegerType    => "INTEGER"
    case ShortType      => "SMALLINT"
    case ByteType       => "TINYINT"
    case DoubleType     => "DOUBLE"
    case FloatType      => "REAL"
    case StringType     => "VARCHAR"
    case BooleanType    => "BOOLEAN"
    case DateType       => "DATE"
    case TimestampType  => "TIMESTAMP"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case BinaryType     => "BLOB"
    case _              => "VARCHAR"
  }

  private val LoadCols = "load_ts TIMESTAMP NOT NULL, record_source VARCHAR NOT NULL"

  /** `md5(canonical rendering)` text — identical to [[graft.governance.Masking]]'s
    * runtime masking expression (doubles through exact DECIMAL(18,2); raw
    * double→string rendering is not engine-portable).
    */
  def maskRendering(name: String, isDouble: Boolean): String =
    if (isDouble) s"md5(CAST(CAST($name AS DECIMAL(18,2)) AS VARCHAR))"
    else s"md5(CAST($name AS VARCHAR))"

  def hubDdl(entity: String, keyDefs: Seq[String]): String =
    s"CREATE TABLE hub_$entity (hub_${entity}_hk CHAR(64) NOT NULL, " +
      s"${keyDefs.mkString(", ")}, $LoadCols, PRIMARY KEY (hub_${entity}_hk))"

  def satDdl(entity: String, attrDefs: Seq[String]): String =
    s"CREATE TABLE sat_$entity (hub_${entity}_hk CHAR(64) NOT NULL, hashdiff CHAR(64) NOT NULL, " +
      s"${attrDefs.mkString(", ")}, $LoadCols, PRIMARY KEY (hub_${entity}_hk, load_ts))"

  def linkDdl(linkName: String, memberEntities: Seq[String], keyDefs: Seq[String]): String =
    s"CREATE TABLE link_$linkName (link_${linkName}_hk CHAR(64) NOT NULL, " +
      memberEntities.map(e => s"hub_${e}_hk CHAR(64) NOT NULL").mkString(", ") +
      s", ${keyDefs.mkString(", ")}, $LoadCols, PRIMARY KEY (link_${linkName}_hk))"

  def maskedViewDdl(entity: String, cells: Seq[String]): String =
    s"CREATE VIEW sat_${entity}_masked AS SELECT hub_${entity}_hk, hashdiff, " +
      s"${cells.mkString(", ")} FROM sat_$entity"

  /** `name TYPE[ NOT NULL]` — type from the live schema, nullability from the
    * measured profile (no profile row ⇒ nullable, the safe default).
    */
  def columnDef(df: DataFrame, profiles: Map[String, ColumnProfile], c: String): String = {
    val notNull = profiles.get(c).exists(_.nullCount == 0L)
    s"$c ${sqlTypeName(df.schema(c).dataType)}" + (if (notNull) " NOT NULL" else "")
  }

  /** Masked-view select cell: masked columns as `md5(rendering) AS name`,
    * pass-through columns as the bare name.
    */
  def maskedCell(
      df: DataFrame,
      profiles: Map[String, ColumnProfile],
      c: String,
      minLevel: PiiLevel
  ): String =
    if (profiles.get(c).exists(_.piiLevel >= minLevel))
      s"${maskRendering(c, df.schema(c).dataType == DoubleType)} AS $c"
    else c

  /** The declared DDL bundle for one entity + one link: hub, link, satellite
    * and masked satellite view, one row per object, ordered by object name.
    */
  def vaultDdl(
      spark: SparkSession,
      entityDf: DataFrame,
      entityProfiles: Seq[ColumnProfile],
      entity: String,
      keyCols: Seq[String],
      attrCols: Seq[String],
      linkDf: DataFrame,
      linkProfiles: Seq[ColumnProfile],
      linkName: String,
      linkMembers: Seq[(String, String)],
      minMaskLevel: PiiLevel = PiiLevel.Medium
  ): DataFrame = {
    import spark.implicits._
    val ep = entityProfiles.map(p => p.originalName -> p).toMap
    val lp = linkProfiles.map(p => p.originalName -> p).toMap
    Seq(
      (s"hub_$entity", "table", hubDdl(entity, keyCols.map(columnDef(entityDf, ep, _)))),
      (s"link_$linkName", "table",
        linkDdl(linkName, linkMembers.map(_._1),
          linkMembers.map { case (_, k) => columnDef(linkDf, lp, k) })),
      (s"sat_$entity", "table", satDdl(entity, attrCols.map(columnDef(entityDf, ep, _)))),
      (s"sat_${entity}_masked", "view",
        maskedViewDdl(entity, attrCols.map(maskedCell(entityDf, ep, _, minMaskLevel))))
    ).toDF("object_name", "kind", "ddl").orderBy("object_name")
  }

  /** DuckDB twin of [[vaultDdl]]: the same strings reassembled in SQL, with
    * every data-dependent term (NOT NULL from null_count, mask decision from
    * pii_level) a scalar subquery over the column's own recomputed profile
    * cascade ([[OracleGen]]). Static text (names, types from the fixed
    * testdata schema) is baked as literals, the OracleGen convention.
    */
  def oracleVaultDdl(
      table: String,
      colTypes: Map[String, String],
      entity: String,
      keyCols: Seq[String],
      attrCols: Seq[String],
      linkTable: String,
      linkColTypes: Map[String, String],
      linkName: String,
      linkMembers: Seq[(String, String)],
      doubleCols: Set[String] = Set.empty,
      maskLevels: Seq[String] = Seq("medium", "high")
  ): String = {
    def colDefSql(t: String, types: Map[String, String])(c: String): String =
      s"'$c ${types(c)}' || (CASE WHEN ${OracleGen.nullCountSubquery(t, c)} = 0 " +
        s"THEN ' NOT NULL' ELSE '' END)"
    def joined(defs: Seq[String]): String = defs.mkString(" || ', ' || ")
    def maskedCellSql(c: String): String = {
      val levels = maskLevels.map(l => s"'$l'").mkString(", ")
      s"(CASE WHEN ${OracleGen.piiLevelSubquery(table, c)} IN ($levels) " +
        s"THEN '${maskRendering(c, doubleCols.contains(c))} AS $c' ELSE '$c' END)"
    }
    val hubHead  = s"CREATE TABLE hub_$entity (hub_${entity}_hk CHAR(64) NOT NULL, "
    val linkHead = s"CREATE TABLE link_$linkName (link_${linkName}_hk CHAR(64) NOT NULL, " +
      linkMembers.map { case (e, _) => s"hub_${e}_hk CHAR(64) NOT NULL" }.mkString(", ") + ", "
    val satHead =
      s"CREATE TABLE sat_$entity (hub_${entity}_hk CHAR(64) NOT NULL, hashdiff CHAR(64) NOT NULL, "
    val viewHead = s"CREATE VIEW sat_${entity}_masked AS SELECT hub_${entity}_hk, hashdiff, "
    val selects = Seq(
      s"""SELECT 'hub_$entity' AS object_name, 'table' AS kind,
         |  '$hubHead' || ${joined(keyCols.map(colDefSql(table, colTypes)))} ||
         |  ', $LoadCols, PRIMARY KEY (hub_${entity}_hk))' AS ddl""".stripMargin,
      s"""SELECT 'link_$linkName', 'table',
         |  '$linkHead' || ${joined(linkMembers.map { case (_, k) => colDefSql(linkTable, linkColTypes)(k) })} ||
         |  ', $LoadCols, PRIMARY KEY (link_${linkName}_hk))'""".stripMargin,
      s"""SELECT 'sat_$entity', 'table',
         |  '$satHead' || ${joined(attrCols.map(colDefSql(table, colTypes)))} ||
         |  ', $LoadCols, PRIMARY KEY (hub_${entity}_hk, load_ts))'""".stripMargin,
      s"""SELECT 'sat_${entity}_masked', 'view',
         |  '$viewHead' || ${joined(attrCols.map(maskedCellSql))} ||
         |  ' FROM sat_$entity'""".stripMargin
    )
    s"""SELECT * FROM (
       |${selects.mkString("\nUNION ALL\n")}
       |) ORDER BY object_name""".stripMargin
  }
}
