package graft.sources

import java.security.MessageDigest
import java.util.{Map => JMap}

import graft.QueryModule
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, FunctionCatalog, Identifier, Table, TableCatalog, TableChange, TableInfo}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The connector's CATALOG face — the way a real estate addresses its
  * tables and functions by IDENTIFIER instead of by path (the
  * Iceberg/Unity model): `spark.sql.catalog.<name> = GraftCatalog` makes
  * `SELECT … FROM <name>.articles.all` and
  * `<name>.fns.split_bucket(key, n)` resolve with no temp views and no
  * Scala in the query path.
  *
  * Three deliberate design points:
  *   - **The filesystem is the catalog state.** `loadTable`/`listTables`
  *     enumerate the corpus artifacts present under `dataDir` AT
  *     RESOLUTION TIME (the reference's `data/` directory is its implied
  *     catalog, SURVEY §3.3) — so a corpus landed by the write face
  *     appears, and one dropped by the metadata delete (q264) disappears,
  *     with no second registry to drift out of sync.
  *   - **Read-only DDL surface.** Corpora are landed by the upstream
  *     (write face, q226/q231) and removed by DELETE (q264);
  *     `CREATE/ALTER/DROP/RENAME TABLE` throw rather than invent a second
  *     mutation path.
  *   - **Functions ship with the catalog** ([[SplitBucket]]): the
  *     engine's seed-free md5 splitter — the q69/q238 spelling — bound as
  *     a V2 `ScalarFunction` whose magic `invoke` method Spark wires via
  *     a codegen'd `Invoke`, not a black-box UDF. This is how a table
  *     format exports its partition transforms (Iceberg's `bucket()`),
  *     and how every engine user gets THE canonical split, not a
  *     re-derivation that drifts.
  *
  * Scale: catalog calls are driver-side and O(#files) metadata-only; the
  * data path is the same pushdown-complete [[ArticlesTable]] scan.
  */
class GraftCatalog extends CatalogPlugin with TableCatalog with FunctionCatalog {
  import GraftCatalog._

  private var catName: String = _
  private var dataDir: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    dataDir = Option(options.get("dataDir")).getOrElse(ArticleSource.dataDir)
  }
  override def name(): String = catName
  override def defaultNamespace(): Array[String] = Array(TableNs)

  /** The corpora whose artifacts exist RIGHT NOW — catalog state IS the
    * landed estate.
    */
  private def landed: Seq[String] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(dataDir)
    val fs = ArticlesFs.get(p)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .map(_.getPath.getName).filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json")).sorted
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespace.sameElements(Array(TableNs)))
      throw new NoSuchNamespaceException(namespace)
    (landed :+ "all").map(Identifier.of(Array(TableNs), _)).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    if (!(ident.namespace.isEmpty || ident.namespace.sameElements(Array(TableNs))))
      throw new NoSuchTableException(ident)
    val present = landed
    ident.name match {
      case "all" => new ArticlesTable(present.mkString(","), dataDir)
      case c if present.contains(c) => new ArticlesTable(c, dataDir)
      case _ => throw new NoSuchTableException(ident)
    }
  }

  private def readOnly: Nothing = throw new UnsupportedOperationException(
    s"$catName is read-only: corpora are landed by the connector's write " +
      "face and removed by DELETE; there is no DDL surface")
  override def createTable(ident: Identifier, info: TableInfo): Table = readOnly
  override def alterTable(ident: Identifier, changes: TableChange*): Table = readOnly
  override def dropTable(ident: Identifier): Boolean = readOnly
  override def renameTable(old: Identifier, next: Identifier): Unit = readOnly

  override def listFunctions(namespace: Array[String]): Array[Identifier] = {
    if (!namespace.sameElements(Array(FnNs)))
      throw new NoSuchNamespaceException(namespace)
    Array(Identifier.of(Array(FnNs), SplitBucket.name()))
  }
  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.namespace.sameElements(Array(FnNs)) &&
      ident.name == SplitBucket.name()) SplitBucket
    else throw new NoSuchFunctionException(ident)
}

private[sources] object GraftCatalog {
  val TableNs = "articles"
  val FnNs = "fns"
}

/** `split_bucket(key STRING, n INT) → INT`: the engine's ONE seed-free
  * splitter — `conv(substring(md5(key), 1, 7), 16, 10) % n`, the exact
  * q69/q238 spelling — as a catalog-shipped V2 scalar function. The
  * digest math reproduces the hex-prefix parse bit-for-bit (first 3
  * digest bytes plus the high nibble of the 4th ARE the first 7 hex
  * chars), so SQL-front-door users, the Scala API and the DuckDB oracle
  * replay all agree on every split ever taken.
  */
object SplitBucket extends UnboundFunction {
  override def name(): String = "split_bucket"
  override def description(): String =
    "split_bucket(key STRING, n INT) -> INT: " +
      "conv(substring(md5(key),1,7),16,10) % n — the engine's seed-free splitter"
  override def bind(inputType: StructType): BoundFunction = {
    val ok = inputType.fields.length == 2 &&
      inputType.fields(0).dataType == StringType &&
      inputType.fields(1).dataType == IntegerType
    if (!ok) throw new UnsupportedOperationException(
      s"expected (STRING, INT), got ${inputType.simpleString}")
    BoundSplitBucket
  }
}

object BoundSplitBucket extends ScalarFunction[Int] {
  override def inputTypes(): Array[DataType] = Array(StringType, IntegerType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "split_bucket"
  override def canonicalName(): String = "graft.fns.split_bucket"
  override def isDeterministic: Boolean = true
  override def isResultNullable: Boolean = false

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Magic method: Spark plans this as a codegen'd `Invoke` on unboxed
    * args — no row boxing, no UDF.
    */
  def invoke(key: UTF8String, n: Int): Int = {
    require(n > 0, s"split_bucket: n must be positive, got $n")
    val d = md.get(); d.reset()
    val h = d.digest(key.getBytes)
    // first 7 hex chars of the digest as an integer (28 bits, positive)
    val v = ((h(0) & 0xffL) << 20) | ((h(1) & 0xffL) << 12) |
      ((h(2) & 0xffL) << 4) | ((h(3) & 0xf0L) >>> 4)
    (v % n).toInt
  }
  /** Interpreted fallback for engines that skip the magic-method path. */
  override def produceResult(row: InternalRow): Int =
    invoke(row.getUTF8String(0), row.getInt(1))
}

/** q263/q264 — the catalog face as driver-verifiable queries. */
object CatalogOps extends QueryModule {

  /** q263: SQL-only split audit through the catalog — table AND function
    * both resolved by identifier (`graft.articles.all`,
    * `graft.fns.split_bucket`), zero temp views, zero Scala in the query:
    * per-bucket article counts over the 8-way split of the canonical
    * article key. The oracle replays the md5 hex-prefix parse digit by
    * digit ([[graft.Exact.sqlHexToLong]]), so the catalog function's
    * digest arithmetic is hash-verified against an independent spelling.
    *
    * Scale: the split is map-side (one digest per row, codegen'd Invoke);
    * the audit aggregate is O(n) rows into O(buckets) groups.
    */
  private def q263(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    s.sql(
      """SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_articles,
        |  CAST(COUNT(doi) AS BIGINT) AS n_with_doi,
        |  MIN(titre) AS first_title
        |FROM (
        |  SELECT graft.fns.split_bucket(coalesce(doi, titre, ''), 8) AS bucket,
        |         doi, titre
        |  FROM graft.articles.all)
        |GROUP BY bucket ORDER BY bucket""".stripMargin)
  }

  private val q263Sql = {
    val one = (c: String) =>
      s"""SELECT NULLIF(doi,'') AS doi, NULLIF(titre,'') AS titre
         |FROM read_json_auto('${ArticleSource.dataDir}/$c.json')""".stripMargin
    val hex7 = graft.Exact.sqlHexToLong("md5(coalesce(doi, titre, ''))", 1, 7)
    s"""WITH u AS (
       |${Seq("ai_articles", "blockchain_articles",
              "acm_machine_learning_articles", "acm_blockchain_articles")
         .map(one).mkString("\nUNION ALL BY NAME\n")})
       |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_articles,
       |  CAST(COUNT(doi) AS BIGINT) AS n_with_doi,
       |  MIN(titre) AS first_title
       |FROM (SELECT CAST(($hex7) % 8 AS INTEGER) AS bucket, doi, titre FROM u)
       |GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  /** q264: METADATA-ONLY DELETE at file granularity
    * ([[ArticlesTable.deleteWhere]]) — the partition-aligned
    * retention/GDPR sweep: `DELETE FROM <cat>.articles.all WHERE
    * indexation = 'ACM'` drops the two ACM corpora by deleting their
    * artifacts (zero bytes read, zero rows rewritten), and the next read
    * through the catalog sees only the surviving estate because the
    * catalog lists the filesystem at resolution time. Runs against a
    * STAGED COPY of the landed estate (the reference dir is read-only
    * upstream truth); the `_DONE` marker makes re-runs within a session
    * idempotent — they re-audit the already-deleted estate.
    *
    * Scale: the delete is O(#matching files) driver-side FS calls — the
    * reason file-aligned deletes are free at 100 TB while sub-file ones
    * cost a copy-on-write rewrite (q256). Sub-file predicates are
    * REJECTED (`canDeleteWhere`), pinned by GraftCatalogSpec.
    */
  private def q264(s: SparkSession, dir: String): DataFrame = {
    val safe = dir.replaceAll("[^A-Za-z0-9]", "_")
    val appId = s.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")
    val stage = graft.StagingDirs.register(
      s"${System.getProperty("java.io.tmpdir")}/graft_catdel_${appId}_$safe")
    val cat = s"graft_del_$safe"
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.dataDir", stage)
    val done = java.nio.file.Paths.get(stage, "_DONE")
    if (!java.nio.file.Files.exists(done)) {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(stage))
      Seq("ai_articles", "blockchain_articles",
        "acm_machine_learning_articles", "acm_blockchain_articles").foreach { c =>
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(ArticleSource.dataDir, s"$c.json"),
          java.nio.file.Paths.get(stage, s"$c.json"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      s.sql(s"DELETE FROM $cat.articles.all WHERE indexation = 'ACM'")
      java.nio.file.Files.createFile(done)
    }
    s.sql(
      s"""SELECT indexation, CAST(COUNT(*) AS BIGINT) AS n_articles,
         |  CAST(COUNT(doi) AS BIGINT) AS n_with_doi,
         |  CAST(COUNT(DISTINCT _corpus) AS BIGINT) AS n_corpora
         |FROM $cat.articles.all
         |GROUP BY indexation ORDER BY indexation""".stripMargin)
  }

  private val q264Sql = {
    val one = (c: String) =>
      s"""SELECT '$c' AS corpus, NULLIF(doi,'') AS doi,
         |  NULLIF(indexation,'') AS indexation
         |FROM read_json_auto('${ArticleSource.dataDir}/$c.json')""".stripMargin
    s"""WITH u AS (
       |${Seq("ai_articles", "blockchain_articles")
         .map(one).mkString("\nUNION ALL BY NAME\n")})
       |SELECT indexation, CAST(COUNT(*) AS BIGINT) AS n_articles,
       |  CAST(COUNT(doi) AS BIGINT) AS n_with_doi,
       |  CAST(COUNT(DISTINCT corpus) AS BIGINT) AS n_corpora
       |FROM u GROUP BY 1 ORDER BY 1""".stripMargin
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q263_catalog_function" -> q263, "q264_catalog_delete" -> q264)
  override def oracles: Map[String, String] =
    Map("q263_catalog_function" -> q263Sql, "q264_catalog_delete" -> q264Sql)
}
