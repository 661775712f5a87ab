package graft.pattern

import graft.model._

/** The deterministic classification rules: regex banks + decision cascades.
  *
  * Regexes are ported verbatim from the reference pattern banks
  * (`src/ai_pipeline/core/classifiers/pattern_classifier.py:26-62`), restricted
  * to the Java∩RE2 common dialect so the same literal runs under Spark `rlike`
  * (java.util.regex) and the DuckDB oracle (RE2). `re.IGNORECASE` becomes an
  * inline `(?i)` prefix. All patterns are `^...$`-anchored, so partial-match
  * engines (rlike, regexp_matches) behave as full matches.
  *
  * Every rule here is a pure function over [[graft.model.ColumnStats]]: the
  * distributed job measures, the cascade decides driver-side on one stats row
  * per column. This keeps the engine's semantics independent of Spark and
  * directly mirrorable into oracle SQL (graft.engine.OracleGen).
  */
object PatternRules {

  /** One anchored regex with a stable key. The key names the aggregate column
    * in the stats pass and the generated oracle SQL — never change keys
    * without regenerating both sides.
    */
  final case class Pattern(key: String, regex: String)

  final case class Bank(semanticType: SemanticType, patterns: Seq[Pattern])

  // --- Pattern banks (pattern_classifier.py:28-62) -------------------------

  val emailBank: Bank = Bank(
    SemanticType.Email,
    Seq(
      Pattern("email_1", """(?i)^[\w.+-]+@[\w-]+\.[\w.-]+$"""),
      Pattern("email_2", """(?i)^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$""")
    )
  )

  val phoneBank: Bank = Bank(
    SemanticType.Phone,
    Seq(
      Pattern("phone_1", """^\+?1?\d{9,15}$"""),
      Pattern("phone_2", """^\(?([0-9]{3})\)?[-. ]?([0-9]{3})[-. ]?([0-9]{4})$"""),
      Pattern("phone_3", """^\+?[\d\s\-\(\)\.]{10,18}$""")
    )
  )

  val dateBank: Bank = Bank(
    SemanticType.Date,
    Seq(
      Pattern("date_iso", """^\d{4}-\d{2}-\d{2}$"""),
      Pattern("date_mdy", """^\d{2}[/-]\d{2}[/-]\d{4}$"""),
      Pattern("date_ymd_slash", """^\d{4}/\d{2}/\d{2}$"""),
      Pattern("date_month_name", """^\w+\s+\d{1,2},\s+\d{4}$""")
    )
  )

  val numericBank: Bank = Bank(
    SemanticType.Numeric,
    Seq(
      Pattern("num_int", """^-?\d+$"""),
      Pattern("num_decimal", """^-?\d*\.\d+$"""),
      Pattern("num_comma", """^-?\d{1,3}(,\d{3})*(\.\d+)?$"""),
      Pattern("num_currency", """^\$?\d+(\.\d{2})?$""")
    )
  )

  val booleanBank: Bank = Bank(
    SemanticType.Boolean,
    Seq(
      Pattern("bool_tf", """(?i)^(true|false)$"""),
      Pattern("bool_yesno", """(?i)^(yes|no)$"""),
      Pattern("bool_yn", """(?i)^(y|n)$"""),
      Pattern("bool_10", """^(1|0)$"""),
      Pattern("bool_onoff", """(?i)^(on|off)$""")
    )
  )

  /** Identifier bank exists in the reference but is explicitly skipped in the
    * type-detection loop (`pattern_classifier.py:146-147`); identifiers are
    * name+uniqueness driven. Kept for completeness / future content-driven
    * identifier detection.
    */
  val identifierBank: Bank = Bank(
    SemanticType.Identifier,
    Seq(
      Pattern("ident_alnum", """^[A-Z0-9]{8,}$"""),
      Pattern("ident_numeric", """^\d{6,}$"""),
      Pattern(
        "ident_uuid",
        """(?i)^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"""
      )
    )
  )

  /** Business-code shape used by `_is_business_key`
    * (`pattern_classifier.py:205`).
    */
  val businessCodePattern: Pattern = Pattern("biz_code", """^[A-Z]{2,4}$|^[A-Z][0-9]{1,3}$""")

  /** Bank precedence. The reference iterates insertion order EMAIL → PHONE →
    * DATE → NUMERIC → BOOLEAN (`pattern_classifier.py:145`), but its loose
    * phone pattern `^\+?[\d\s\-\(\)\.]{10,18}$` swallows ISO dates
    * ("2023-01-15" is 10 chars of digits+dashes), so the code would classify
    * the reference's own date fixture as PHONE while `test_date_detection`
    * (`tests/unit/test_classifiers.py:60-66`) demands DATE. Tests are the
    * spec (same rule as SURVEY.md §0.2(3)): the rebuild checks DATE before
    * PHONE — documented divergence. No phone fixture matches any date
    * pattern, so phone detection is unaffected. Still load-bearing:
    * 10–15-digit integers classify as PHONE before NUMERIC; "1"/"0" columns
    * as NUMERIC before BOOLEAN.
    */
  val typeBanks: Seq[Bank] = Seq(emailBank, dateBank, phoneBank, numericBank, booleanBank)

  /** Every pattern the stats pass must measure per column. */
  val measuredPatterns: Seq[Pattern] =
    typeBanks.flatMap(_.patterns) :+ businessCodePattern

  /** Match-ratio acceptance threshold (`pattern_classifier.py:153`). */
  val MatchThreshold = 0.8

  /** Business-code acceptance threshold (`pattern_classifier.py:206`). */
  val CodeThreshold = 0.5

  /** Constant confidence of pattern classification
    * (`pattern_classifier.py:101,133`).
    */
  val PatternConfidence = 0.8

  // --- Name keyword lists ---------------------------------------------------

  val identifierNameKeywords: Seq[String] = Seq("id", "key", "uuid", "guid")
  val primaryKeyNameKeywords: Seq[String] = Seq("id", "key")
  val businessKeyNameKeywords: Seq[String] =
    Seq("code", "type", "status", "category", "class", "group", "dept", "region")
  val highPiiNameKeywords: Seq[String]   = Seq("ssn", "social", "credit", "password", "secret")
  val mediumPiiNameKeywords: Seq[String] = Seq("name", "address", "location", "birth")
  val lowPiiNameKeywords: Seq[String]    = Seq("first", "last", "city", "state", "zip")

  private def nameContainsAny(name: String, keywords: Seq[String]): Boolean = {
    val lower = name.toLowerCase(java.util.Locale.ROOT)
    keywords.exists(lower.contains)
  }

  // --- Decision cascade (pure functions over ColumnStats) -------------------

  /** `_is_likely_identifier` (`pattern_classifier.py:168-177`): id-ish name ∧
    * unique_ratio > 0.9.
    */
  def isLikelyIdentifier(stats: ColumnStats): Boolean =
    nameContainsAny(stats.name, identifierNameKeywords) && stats.uniqueRatio > 0.9

  /** `_detect_data_type` (`pattern_classifier.py:139-166`) with the
    * SURVEY.md §0.2(3) fix: the name-based identifier heuristic pre-empts the
    * NUMERIC/BOOLEAN banks (so `customer_id` = [1001..1005] classifies as
    * IDENTIFIER, per the reference's own test intent,
    * `tests/unit/test_classifiers.py:44-50`), while content-specific banks
    * (EMAIL/PHONE/DATE) still win over the name heuristic.
    *
    * Ratios are evaluated over the full column rather than a seeded 1000-row
    * sample (declared semantic refinement, SURVEY.md §4.4 — the limit behavior
    * of the reference as sample→population, and exactly reproducible across
    * engines).
    */
  def detectDataType(stats: ColumnStats): SemanticType = {
    if (stats.nonNullCount == 0) return SemanticType.Text

    def bankHits(b: Bank): Boolean =
      b.patterns.exists(p => stats.matchRatio(p.key) >= MatchThreshold)

    Seq(emailBank, dateBank, phoneBank).find(bankHits).map(_.semanticType).getOrElse {
      if (isLikelyIdentifier(stats)) SemanticType.Identifier
      else
        Seq(numericBank, booleanBank).find(bankHits).map(_.semanticType).getOrElse {
          if (stats.uniqueRatio > 0.95 && stats.name.toLowerCase(java.util.Locale.ROOT).contains("id"))
            SemanticType.Identifier
          else if (stats.uniqueRatio < 0.1 && stats.nonNullCount > 10)
            SemanticType.BusinessKey
          else SemanticType.Text
        }
    }
  }

  /** `_is_primary_key` (`pattern_classifier.py:179-191`). */
  def isPrimaryKey(stats: ColumnStats, dataType: SemanticType): Boolean =
    (stats.uniqueRatio >= 0.99 && nameContainsAny(stats.name, primaryKeyNameKeywords)) ||
      (stats.uniqueRatio == 1.0 && dataType == SemanticType.Identifier)

  /** `_is_business_key` (`pattern_classifier.py:193-209`). `len(sample)` in
    * the reference is the non-null count (post-dropna).
    */
  def isBusinessKey(stats: ColumnStats, dataType: SemanticType): Boolean =
    nameContainsAny(stats.name, businessKeyNameKeywords) ||
      (dataType == SemanticType.Text && stats.uniqueRatio < 0.3 && stats.nonNullCount > 10 &&
        stats.matchRatio(businessCodePattern.key) > CodeThreshold)

  /** `_detect_pii_level` (`pattern_classifier.py:211-234`) — first hit wins,
    * high→low order.
    */
  def detectPiiLevel(name: String, dataType: SemanticType): PiiLevel =
    if (dataType == SemanticType.Email || dataType == SemanticType.Phone) PiiLevel.High
    else if (nameContainsAny(name, highPiiNameKeywords)) PiiLevel.High
    else if (nameContainsAny(name, mediumPiiNameKeywords)) PiiLevel.Medium
    else if (nameContainsAny(name, lowPiiNameKeywords)) PiiLevel.Low
    else PiiLevel.None

  /** `_generate_suggested_name` (`pattern_classifier.py:236-241`):
    * snake_case-ify. Non-alphanumeric runs → `_`, camelCase boundary split,
    * lowercase, strip leading/trailing `_`.
    */
  def suggestedName(columnName: String): String = {
    val collapsed = columnName.replaceAll("[^0-9a-zA-Z]+", "_")
    val snaked    = collapsed.replaceAll("([a-z])([A-Z])", "$1_$2")
    val lowered   = snaked.toLowerCase(java.util.Locale.ROOT)
    // Python str.strip('_') semantics: remove leading+trailing underscores.
    lowered.dropWhile(_ == '_').reverse.dropWhile(_ == '_').reverse
  }

  /** `_generate_business_meaning` (`pattern_classifier.py:243-258`). */
  def businessMeaning(columnName: String, dataType: SemanticType): String = {
    val words = columnName.replaceAll("[_\\-]", " ").toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)
    val joined = words.mkString(" ")
    dataType match {
      case SemanticType.Identifier  => s"Unique identifier for $joined"
      case SemanticType.BusinessKey => s"Business classification code for $joined"
      case SemanticType.Email       => s"Email address field for $joined"
      case SemanticType.Phone       => s"Phone number for $joined"
      case SemanticType.Date        => s"Date/timestamp for $joined"
      case SemanticType.Numeric     => s"Numeric measurement of $joined"
      case SemanticType.Boolean     => s"Boolean flag indicating $joined"
      case SemanticType.Text        => s"Text description of $joined"
      case _                        => s"Data field for $joined"
    }
  }

  /** Full profile assembly for one column (`pattern_classifier.py:64-108`). */
  def profileColumn(stats: ColumnStats): ColumnProfile = {
    val dt = detectDataType(stats)
    ColumnProfile(
      originalName = stats.name,
      suggestedName = suggestedName(stats.name),
      dataType = dt,
      isPrimaryKey = isPrimaryKey(stats, dt),
      isBusinessKey = isBusinessKey(stats, dt),
      piiLevel = detectPiiLevel(stats.name, dt),
      uniqueRatio = stats.uniqueRatio,
      nullRatio = stats.nullRatio,
      sampleValues = stats.sampleValues,
      confidenceScore = PatternConfidence,
      businessMeaning = businessMeaning(stats.name, dt),
      totalRows = stats.totalRows,
      uniqueCount = stats.uniqueCount,
      nullCount = stats.nullCount
    )
  }
}
