package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** ERDDAP-convention CSV sources (reference: S1–S6, S10–S11 in SURVEY.md §2.1).
  *
  * ERDDAP tabledap/search CSV responses have TWO header rows: row 1 is
  * column names, row 2 is units — the reference always skips it
  * (`skiprows=[1]`, /root/reference/gdutils/__init__.py:456,567,757,805).
  * NA tokens are the literal strings `none` / `None`
  * (/root/reference/gdutils/__init__.py:567), and column names arrive
  * denormalized ("Dataset ID" → dataset_id,
  * /root/reference/gdutils/__init__.py:409-410).
  *
  * Distributed design: we cannot "skip line 2" of each file cheaply in a
  * cluster read, so we read with `header=true` (names consumed), keep every
  * column as string, drop unit rows by predicate (a unit row never parses as
  * a data row under the supplied schema's first typed column), normalize NA
  * tokens, then cast to the target schema. This keeps the scan fully
  * parallel over a glob of thousands of per-dataset files (S10/S11), with
  * `input_file_name()` available for filename-derived keys
  * (/root/reference/gdutils/io.py:8,37-42).
  */
object ErddapCsv {

  /** Normalize an ERDDAP column name: spaces→underscores, lowercase
    * (/root/reference/gdutils/__init__.py:409-410). */
  def normalizeName(s: String): String = s.replace(" ", "_").toLowerCase

  private val NaTokens = Seq("none", "None", "NaN", "")

  /** Read ERDDAP-convention CSV(s): 2-header-row layout, NA tokens,
    * normalized column names, cast to `schema` (whose field names are the
    * already-normalized names). `timeField` identifies the column used to
    * recognize (and drop) the units row: a units row has a non-castable
    * value there (e.g. "UTC").
    */
  def read(spark: SparkSession, path: String, schema: StructType,
           timeField: String = "time"): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .csv(path)
    val normed = raw.toDF(raw.columns.map(normalizeName).toIndexedSeq: _*)
    // Null out NA tokens in every column while still string-typed.
    val cleaned = normed.select(normed.columns.map { c =>
      when(col(c).isin(NaTokens: _*), lit(null)).otherwise(col(c)).as(c)
    }.toIndexedSeq: _*)
    // Units row: the reference drops line 2 unconditionally (skiprows=[1])
    // but a distributed multi-file read has no row numbers, so detect it:
    // a units row has an unparseable time AND (when other typed columns
    // exist) some other typed column unparseable too ("UTC" +
    // "degrees_north"). A data row whose ONLY bad cell is one field is
    // kept with that field null (pandas errors='coerce'), not dropped.
    // try_* variants everywhere: ANSI mode would otherwise throw.
    val tf = normalizeName(timeField)
    def failing(name: String, dt: org.apache.spark.sql.types.DataType) =
      col(name).isNotNull && expr(s"try_cast(`$name` AS ${dt.sql})").isNull
    val noUnits =
      if (cleaned.columns.contains(tf)) {
        val timeFails = failing(tf, org.apache.spark.sql.types.TimestampType)
        val others = schema.fields
          .filter(f => f.name != tf && cleaned.columns.contains(f.name) &&
            f.dataType != org.apache.spark.sql.types.StringType)
        val unitsRow =
          if (others.isEmpty) timeFails
          else timeFails && others.map(f => failing(f.name, f.dataType))
            .reduce(_ || _)
        cleaned.where(!unitsRow)
      } else cleaned
    // Cast to target schema (missing columns become null columns;
    // malformed cells → null, matching pandas errors='coerce').
    noUnits.select(schema.fields.map { f =>
      (if (noUnits.columns.contains(f.name))
         expr(s"try_cast(`${f.name}` AS ${f.dataType.sql})")
       else lit(null).cast(f.dataType)).as(f.name)
    }.toIndexedSeq: _*)
  }

  /** Catalog-scan cleanup applied after reading an ERDDAP advanced-search
    * CSV (S1/S2): drop the `allDatasets` pseudo-row
    * (/root/reference/gdutils/__init__.py:509-510) and optionally the
    * `-delayed` twins (/root/reference/gdutils/__init__.py:516-518). */
  def cleanCatalog(catalog: DataFrame, includeDelayed: Boolean = false): DataFrame = {
    val noAll = catalog.where(col("dataset_id") =!= "allDatasets")
    if (includeDelayed) noAll
    else noAll.where(!col("dataset_id").endsWith("delayed"))
  }

  /** Batch import with the dataset id parsed from the FILE NAME
    * (S10/S11; regex at /root/reference/gdutils/io.py:8). */
  def withDatasetIdFromFilename(df: DataFrame,
      pattern: String = "([^/]+?)(?:_gts)?_obs\\.csv$"): DataFrame =
    df.withColumn("dataset_id", regexp_extract(input_file_name(), pattern, 1))
}
