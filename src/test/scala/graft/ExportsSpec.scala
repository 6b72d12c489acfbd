package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.config.ConceptsConfig
import graft.exports.{ConceptSetCreator, ConceptsExport, LocationsExport, OrderTypesExport}
import graft.sink.CsvSink
import graft.sources.{CsvSource, JdbcSource}
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

class ExportsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import ExportFixtures._

  private val cfg = ConceptsConfig(
    locales = Seq("en", "es"),
    mappingTypes = Seq("SAME-AS", "NARROWER-THAN"),
    conceptSources = Seq("PIH|Name", "PIH|Number", "CIEL"))

  private def wideByUuid = ConceptsExport.wide(conceptResolver, cfg)
    .collect().map(r => r.getAs[String]("uuid") -> r).toMap

  test("concepts wide: names pivot per (locale, type); voided names dropped") {
    val w = wideByUuid
    assert(w("uuid-2").getAs[String]("Fully specified name:en") == "Weight")
    assert(w("uuid-2").getAs[String]("Short name:en") == "Wt")
    assert(w("uuid-2").getAs[String]("Fully specified name:es") == "Peso")
    assert(w("uuid-4").getAs[String]("Fully specified name:en") == "Yes")
    assert(w("uuid-2").getAs[String]("Short name:es") == null)
  }

  test("concepts wide: retired concepts excluded; retired terms dropped") {
    val w = wideByUuid
    assert(!w.contains("uuid-6"))
    // concept 4's only live mapping is CIEL 1065 (term 54 retired)
    assert(w("uuid-4").getAs[String]("Mappings|SAME-AS|CIEL") == "1065")
  }

  test("concepts wide: PIH Number/Name cast split in the mappings pivot") {
    val w = wideByUuid
    assert(w("uuid-2").getAs[String]("Mappings|SAME-AS|PIH|Number") == "5089")
    // no-mapping cells are ""/null — the reference coerces NULL to ""
    // at parse time anyway (concept_csv_export.py:577)
    assert(Option(w("uuid-2").getAs[String]("Mappings|SAME-AS|PIH|Name"))
      .forall(_.isEmpty))
    assert(w("uuid-3").getAs[String]("Mappings|SAME-AS|PIH|Name") == "TEMPERATURE")
    assert(w("uuid-3").getAs[String]("Mappings|NARROWER-THAN|CIEL") == "124")
  }

  test("concepts wide: members/answers ordered by sort_weight, retired members dropped") {
    val w = wideByUuid
    assert(w("uuid-1").getAs[String]("Members") == "Temperature;Weight")
    assert(w("uuid-3").getAs[String]("Answers") == "Yes;No")
  }

  test("concepts wide: description newline-stripped; numeric + complex 1:1 columns") {
    val w = wideByUuid
    assert(w("uuid-2").getAs[String]("Description:en") == "Patient weightin kg")
    assert(w("uuid-2").getAs[Double]("Absolute high") == 300.0)
    assert(w("uuid-2").getAs[String]("Units") == "kg")
    assert(w("uuid-2").getAs[Int]("Allow decimals") == 1)
    assert(w("uuid-7").getAs[String]("Complex data handler") == "ImageHandler")
  }

  test("concepts: version gates drop precision columns before 1.11 and pick 'precise' before 2.2") {
    val old = ConceptsExport.wide(conceptResolver, cfg.copy(version = "1.9"))
    assert(!old.columns.contains("Display precision"))
    assert(cfg.copy(version = "2.1").allowDecimalColumn == "precise")
    assert(cfg.copy(version = "2.2").allowDecimalColumn == "allow_decimal")
  }

  test("concepts pipeline: topological order puts referents before referrers") {
    val rows = ConceptsExport.pipeline(conceptResolver, cfg)
      .orderBy(col("__ord"), col("__tie"))
      .select("uuid").as[String].collect().toSeq
    def idx(u: String) = rows.indexOf(u)
    assert(idx("uuid-1") > idx("uuid-2")) // set after members
    assert(idx("uuid-1") > idx("uuid-3"))
    assert(idx("uuid-3") > idx("uuid-4")) // question after answers
    assert(idx("uuid-3") > idx("uuid-5"))
  }

  test("concepts pipeline: tree filter keeps only the root's closure") {
    val rows = ConceptsExport.pipeline(conceptResolver,
        cfg.copy(setName = Some("Vital signs")))
      .select("uuid").as[String].collect().toSet
    assert(rows == Set("uuid-1", "uuid-2", "uuid-3", "uuid-4", "uuid-5"))
  }

  test("concepts: limit applies to the is_set-ordered base query (O3)") {
    val rows = ConceptsExport.pipeline(conceptResolver, cfg.copy(limit = Some(3)))
      .select("uuid").as[String].collect().toSet
    // non-sets first (is_set=0, concept_id asc): 2, 3, 4
    assert(rows == Set("uuid-2", "uuid-3", "uuid-4"))
  }

  test("concepts: key remap fails loudly for concepts missing the key mapping") {
    val e = intercept[IllegalStateException] {
      ConceptsExport.pipeline(conceptResolver,
        cfg.copy(conceptKeyMapping = Some("CIEL")))
    }
    assert(e.getMessage.contains("uuid-7")) // the concept with no mappings
  }

  test("concepts: key remap takes the first (sorted) SAME-AS code as key") {
    val noComplex: String => org.apache.spark.sql.DataFrame = {
      case "concept" => concept.filter(col("concept_id") =!= 7)
      // give concept 3 a SAME-AS CIEL mapping so every concept has a key
      case "concept_reference_term" => conceptReferenceTerm.unionByName(
        Seq((58L, "126", 40L, 0))
          .toDF("concept_reference_term_id", "code", "concept_source_id", "retired"))
      case "concept_reference_map" => conceptReferenceMap.unionByName(
        Seq((3L, 30L, 58L))
          .toDF("concept_id", "concept_map_type_id", "concept_reference_term_id"))
      case other => conceptTables(other)
    }
    val rows = ConceptsExport.pipeline(noComplex,
        cfg.copy(conceptKeyMapping = Some("CIEL")))
    val keys = rows.select("uuid", "_mapping:CIEL").as[(String, String)]
      .collect().toMap
    assert(keys("uuid-2") == "5089")
    assert(keys("uuid-1") == "1114")
  }

  test("concepts export end-to-end: header contract, pruning, row order, empty Void/Retire") {
    val out = Files.createTempDirectory("graft-test").resolve("concepts.csv").toString
    ConceptsExport.export(conceptResolver, cfg, out)
    val lines = Files.readAllLines(Paths.get(out)).asScala.toSeq
    val header = lines.head.split(",", -1).toSeq
    // fixed leading block (R4)
    assert(header.take(10) == Seq("uuid", "Void/Retire",
      "Fully specified name:en", "Short name:en", "Fully specified name:es",
      "Description:en", "Data class", "Data type", "Answers", "Members"))
    // all-empty columns pruned (no es SHORT names, no Critical high, no PIH|Name SAME-AS... )
    assert(!header.contains("Short name:es"))
    assert(!header.contains("Critical high"))
    assert(header.contains("Mappings|SAME-AS|CIEL"))
    // Void/Retire kept but empty on every row
    val vIdx = header.indexOf("Void/Retire")
    assert(lines.tail.forall(_.split(",", -1)(vIdx) == ""))
    // referents precede referrers in the file
    val uuids = lines.tail.map(_.split(",", -1).head)
    assert(uuids.indexOf("uuid-1") > uuids.indexOf("uuid-2"))
    assert(uuids.indexOf("uuid-3") > uuids.indexOf("uuid-5"))
    assert(uuids.length == 6)
  }

  test("concepts: stop-character scan flags ';' in codes and names (V1)") {
    val withStop: String => org.apache.spark.sql.DataFrame = {
      case "concept_reference_term" =>
        Seq((90L, "12;34", 40L, 0))
          .toDF("concept_reference_term_id", "code", "concept_source_id", "retired")
      case "concept_name" =>
        Seq((2L, "Weight; in kg", "en", "FULLY_SPECIFIED", 0))
          .toDF("concept_id", "name", "locale", "concept_name_type", "voided")
      case other => conceptTables(other)
    }
    val hits = ConceptsExport.stopCharacterScan(withStop, cfg)
      .select("kind").as[String].collect().sorted.toSeq
    assert(hits == Seq("code", "name"))
  }

  test("locations export: dynamic Tag|/Attribute| columns, ':' values intact, id order") {
    val out = Files.createTempDirectory("graft-test").resolve("locations.csv").toString
    LocationsExport.export(locationResolver, out)
    val lines = Files.readAllLines(Paths.get(out)).asScala.toSeq
    val header = lines.head.split(",", -1).toSeq
    assert(header == Seq("UUID", "Void/Retire", "Name", "Description", "Parent",
      "Attribute|Code", "Tag|Admission Location", "Tag|Facility", "Tag|Login Location"))
    val rows = lines.tail.map(_.split(",", -1).toSeq)
    assert(rows.map(_.head) == Seq("loc-1", "loc-2", "loc-3", "loc-4", "loc-5"))
    val byUuid = rows.map(r => r.head -> header.zip(r).toMap).toMap
    assert(byUuid("loc-2")("Parent") == "Root Hospital")
    // reference splits on ':' and corrupts this value; we keep it whole
    assert(byUuid("loc-2")("Attribute|Code") == "\"CA:01\"" ||
      byUuid("loc-2")("Attribute|Code") == "CA:01")
    assert(byUuid("loc-2")("Tag|Login Location") == "TRUE")
    assert(byUuid("loc-1")("Tag|Login Location") == "")
    assert(byUuid("loc-3")("Void/Retire") == "1")
    assert(byUuid("loc-4")("Parent") == "Campus")
  }

  test("order types export: parent uuid self-join, fixed columns, id order") {
    val out = Files.createTempDirectory("graft-test").resolve("ordertypes.csv").toString
    OrderTypesExport.export(orderTypeResolver, out)
    val lines = Files.readAllLines(Paths.get(out)).asScala.toSeq
    assert(lines.head.split(",", -1).toSeq == OrderTypesExport.columns)
    val rows = lines.tail.map(_.split(",", -1).toSeq)
    assert(rows.map(_.head) == Seq("ot-1", "ot-2"))
    assert(rows(1)(5) == "ot-1") // Test Order's parent uuid
    assert(rows(0)(5) == "")     // root has no parent
  }

  test("concept-set creator: first row is the set, sort weight by input order") {
    val input = Seq(
      ("set-uuid", "", "My Set", "x"),
      ("m1", "", "Member One", "y"),
      ("m2", "TRUE", "Member Two", "z"),
      ("m3", "", "Member Three", "w"))
      .toDF("uuid", "Void/Retire", "Fully specified name:en", "Other")
    val out = Files.createTempDirectory("graft-test").resolve("sets.csv").toString
    ConceptSetCreator.export(input, out)
    val lines = Files.readAllLines(Paths.get(out)).asScala.toSeq
    assert(lines.head.split(",", -1).toSeq == Seq("Concept", "Member",
      "#Fully specified name:en", "Member Type", "Sort Weight", "Void/Retire"))
    val rows = lines.tail.map(_.split(",", -1).toSeq)
    assert(rows.map(_(1)) == Seq("m1", "m2", "m3"))
    assert(rows.map(_(4)) == Seq("1", "2", "3"))
    assert(rows.forall(_(0) == "set-uuid"))
    assert(rows.forall(_(3) == "CONCEPT-SET"))
    assert(rows(1)(5) == "TRUE") // Void/Retire passed through
    assert(rows(0)(2) == "Member One")
  }

  test("csv source: exclude keys dedup across files and anti-join (S4/J13)") {
    val dir = Files.createTempDirectory("graft-test")
    Files.writeString(dir.resolve("e1.csv"), "Fully specified name:en\nWeight\nYes\n")
    Files.writeString(dir.resolve("e2.csv"), "Fully specified name:en\nYes\n")
    val ex = CsvSource.excludeKeys(spark, "Fully specified name:en",
      Seq(dir.resolve("e1.csv").toString, dir.resolve("e2.csv").toString))
    assert(ex.count() == 2)
    val df = Seq("Weight", "Temperature", "Yes").toDF("Fully specified name:en")
    val kept = CsvSource.applyExcludes(df, "Fully specified name:en", ex)
      .as[String].collect().toSeq
    assert(kept == Seq("Temperature"))
  }

  test("jdbc credentials: parses runtime properties; fails on missing values (S3/V4)") {
    val p = Files.createTempDirectory("graft-test").resolve("openmrs-runtime.properties")
    Files.writeString(p, "connection.username=omrs\nconnection.password=secret\n")
    assert(JdbcSource.credentials(p.toString) == (("omrs", "secret")))
    val bad = Files.createTempDirectory("graft-test").resolve("bad.properties")
    Files.writeString(bad, "connection.username=omrs\n")
    intercept[IllegalArgumentException] { JdbcSource.credentials(bad.toString) }
  }

  test("jdbc source: round-trips a table through embedded Derby (S1)") {
    import graft.sources.{JdbcConfig, JdbcSource}
    val url = "jdbc:derby:memory:graftdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE concept_class (concept_class_id BIGINT, name VARCHAR(64))")
      st.execute("INSERT INTO concept_class VALUES (10, 'ConvSet'), (11, 'Misc')")
      st.close()
      val cfg = JdbcConfig("jdbc:derby:memory:graftdb", user = "", password = "")
      val got = JdbcSource.table(spark, cfg, "concept_class")
        .orderBy("concept_class_id")
        .as[(Long, String)].collect().toSeq
      assert(got == Seq((10L, "ConvSet"), (11L, "Misc")))
      // partitioned range read returns the same rows
      val part = JdbcSource.table(spark, cfg.copy(numPartitions = 2),
        "concept_class", partitionKey = Some(("concept_class_id", 0L, 20L)))
      assert(part.rdd.getNumPartitions == 2)
      assert(part.as[(Long, String)].collect().toSet ==
        Set((10L, "ConvSet"), (11L, "Misc")))
      // auto-probed bounds (min/max query) return the same rows; the
      // partition count is Spark's stride decision (a 2-value range
      // collapses to one partition)
      val auto = JdbcSource.tableAutoPartitioned(spark,
        cfg.copy(numPartitions = 2), "concept_class", "concept_class_id")
      assert(auto.as[(Long, String)].collect().toSet ==
        Set((10L, "ConvSet"), (11L, "Misc")))
    } finally conn.close()
  }

  test("jdbc sink: batched write lands rows an independent JDBC read sees; connection cap narrows partitions") {
    import graft.sources.{JdbcConfig, JdbcSource}
    import graft.sink.JdbcSink
    val url = "jdbc:derby:memory:graftsink;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.createStatement()
        .execute("CREATE TABLE scores (doc_id BIGINT, score DOUBLE)")
      val cfg = JdbcConfig("jdbc:derby:memory:graftsink", user = "", password = "",
        numPartitions = 2)
      val df = (1L to 100L).map(i => (i, i * 0.5)).toDF("doc_id", "score")
        .repartition(16) // wider than the cap — the sink must narrow it
      JdbcSink.write(df, cfg, "scores", batchSize = 25)
      val back = JdbcSource.table(spark, cfg, "scores")
        .as[(Long, Double)].collect().toSet
      assert(back == (1L to 100L).map(i => (i, i * 0.5)).toSet)
      // appending again doubles the rows (mode contract)
      JdbcSink.write(df, cfg, "scores")
      assert(JdbcSource.table(spark, cfg, "scores").count() == 200)
    } finally conn.close()
  }

  test("locations export runs end-to-end against a real JDBC database (S1 + product)") {
    import graft.sources.{JdbcConfig, JdbcSource}
    val url = "jdbc:derby:memory:graftloc;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("""CREATE TABLE location (location_id BIGINT, uuid VARCHAR(64),
        name VARCHAR(64), description VARCHAR(128), parent_location BIGINT,
        retired INT)""")
      st.execute("""INSERT INTO location VALUES
        (1, 'loc-1', 'Root', 'the root', NULL, 0),
        (2, 'loc-2', 'Ward', NULL, 1, 0)""")
      st.execute("CREATE TABLE location_tag_map (location_id BIGINT, location_tag_id BIGINT)")
      st.execute("INSERT INTO location_tag_map VALUES (2, 60)")
      st.execute("CREATE TABLE location_tag (location_tag_id BIGINT, name VARCHAR(64))")
      st.execute("INSERT INTO location_tag VALUES (60, 'Admission')")
      st.execute("""CREATE TABLE location_attribute (location_id BIGINT,
        attribute_type_id BIGINT, value_reference VARCHAR(64))""")
      st.execute("INSERT INTO location_attribute VALUES (2, 70, 'W:1')")
      st.execute("""CREATE TABLE location_attribute_type
        (location_attribute_type_id BIGINT, name VARCHAR(64))""")
      st.execute("INSERT INTO location_attribute_type VALUES (70, 'Code')")
      st.close()
      val resolver = JdbcSource.resolver(spark,
        JdbcConfig("jdbc:derby:memory:graftloc", user = "", password = ""))
      val out = Files.createTempDirectory("graft-test").resolve("loc_jdbc.csv").toString
      graft.exports.LocationsExport.export(resolver, out)
      val lines = Files.readAllLines(Paths.get(out)).asScala.toSeq
      assert(lines.head == "UUID,Void/Retire,Name,Description,Parent,Attribute|Code,Tag|Admission")
      assert(lines(1) == "loc-1,0,Root,the root,,,")
      assert(lines(2) == "loc-2,0,Ward,,Root,W:1,TRUE")
    } finally conn.close()
  }

  test("csv sink: pruneEmptyColumns treats null and empty string alike, keeps alwaysKeep") {
    val df = Seq(
      ("a", "", None: Option[String], "x"),
      ("b", "", None: Option[String], "")).toDF("k", "empty1", "empty2", "mixed")
    val pruned = CsvSink.pruneEmptyColumns(df, alwaysKeep = Set("empty1"))
    assert(pruned.columns.toSeq == Seq("k", "empty1", "mixed"))
  }

  test("csv sink: zero-row input writes a header-only CSV (no NPE on the probe)") {
    val df = Seq(("a", "b")).toDF("k", "v").filter(col("k") === "nope")
    val pruned = CsvSink.pruneEmptyColumns(df, alwaysKeep = Set("k"))
    assert(pruned.columns.toSeq == Seq("k"))
    val out = Files.createTempDirectory("graft-test").resolve("empty.csv").toString
    CsvSink.write(pruned, Seq("k"), Seq(col("k")), out)
    assert(Files.readAllLines(Paths.get(out)).asScala.toSeq == Seq("k"))
  }

  test("jdbc auto-partitioned bounds work on an INTEGER (non-BIGINT) key") {
    import graft.sources.{JdbcConfig, JdbcSource}
    val url = "jdbc:derby:memory:graftint;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      // INT key: MIN/MAX come back as IntegerType — the reference
      // schema's PKs (concept_id etc.) are INT, not BIGINT
      st.execute("CREATE TABLE concept (concept_id INT, uuid VARCHAR(64))")
      st.execute("INSERT INTO concept VALUES (1, 'u1'), (2, 'u2'), (3, 'u3')")
      st.close()
      val cfg = JdbcConfig("jdbc:derby:memory:graftint", user = "", password = "")
      val auto = JdbcSource.tableAutoPartitioned(spark,
        cfg.copy(numPartitions = 2), "concept", "concept_id")
      assert(auto.as[(Int, String)].collect().toSet ==
        Set((1, "u1"), (2, "u2"), (3, "u3")))
    } finally conn.close()
  }

  test("jdbc scan pushes filters down to the database (S1 scale claim)") {
    import graft.sources.{JdbcConfig, JdbcSource}
    val url = "jdbc:derby:memory:graftpush;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE obs (obs_id BIGINT, voided INT, value_text VARCHAR(64))")
      st.execute("INSERT INTO obs VALUES (1, 0, 'a'), (2, 1, 'b'), (3, 0, 'c')")
      st.close()
      val cfg = JdbcConfig("jdbc:derby:memory:graftpush", user = "", password = "")
      val filtered = JdbcSource.table(spark, cfg, "obs")
        .filter(col("voided") === 0).select("obs_id")
      val plan = filtered.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters:") &&
        plan.toLowerCase.contains("equalto(voided,0)"),
        s"voided filter should push into the JDBC scan, got:\n$plan")
      assert(filtered.as[Long].collect().toSet == Set(1L, 3L))
    } finally conn.close()
  }

  test("concepts export end-to-end through JDBC: Catalyst pushes the filters the reference hand-wrote into its SQL; audit columns never leave the database (S1)") {
    import graft.sources.{JdbcConfig, JdbcSource}
    import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
    val url = "jdbc:derby:memory:graftconcepts;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      val cfgJ = JdbcConfig("jdbc:derby:memory:graftconcepts",
        user = "", password = "")
      conceptTables.foreach { case (name, df) =>
        val cols = df.schema.fields.map { f =>
          val t = f.dataType match {
            case LongType => "BIGINT"
            case IntegerType => "INTEGER"
            case DoubleType => "DOUBLE"
            case _ => "VARCHAR(256)"
          }
          s"${f.name} $t"
        }
        // real OpenMRS tables carry audit columns the export never
        // reads — include them so column pruning is OBSERVABLE: a scan
        // that reads the whole row would surface them in the plan
        val audit = Seq("creator BIGINT", "date_created VARCHAR(32)",
          "changed_by BIGINT")
        st.execute(s"CREATE TABLE $name (${(cols ++ audit).mkString(", ")})")
        graft.sink.JdbcSink.write(df, cfgJ, name)
      }
      st.close()
      val resolver = JdbcSource.resolver(spark, cfgJ)
      // plan gate: the reference hand-pushed retired/voided into its
      // mega-query SQL (concept_csv_export.py:533-558); Catalyst must
      // push OUR declarative filters into the JDBC scans unaided
      val plan = ConceptsExport.wide(resolver, cfg)
        .queryExecution.executedPlan.toString
      val lc = plan.toLowerCase
      assert(lc.contains("pushedfilters"),
        s"no pushed filters in any JDBC scan:\n${plan.take(2000)}")
      assert(lc.contains("equalto(retired,0)"),
        s"concept retired filter not pushed:\n${plan.take(2000)}")
      assert(lc.contains("equalto(voided,0)"),
        s"name voided filter not pushed:\n${plan.take(2000)}")
      assert(!lc.contains("date_created") && !lc.contains("changed_by"),
        "audit columns leaked into a JDBC scan — column pruning lost")
      // end-to-end: the JDBC-ingress CSV is byte-identical to the
      // fixture-ingress CSV (same rows, same ordering, same pruning)
      val tmp = Files.createTempDirectory("graft-test")
      val outJ = tmp.resolve("concepts_jdbc.csv").toString
      val outF = tmp.resolve("concepts_fix.csv").toString
      ConceptsExport.export(resolver, cfg, outJ)
      ConceptsExport.export(conceptResolver, cfg, outF)
      val gotJ = Files.readAllLines(Paths.get(outJ)).asScala.toSeq
      assert(gotJ == Files.readAllLines(Paths.get(outF)).asScala.toSeq)
      assert(gotJ.length > 1, "export produced no data rows through JDBC")
    } finally conn.close()
  }

  test("concepts: key-remap guard materializes the wide plan once (checkpoint-backed)") {
    val noComplex: String => org.apache.spark.sql.DataFrame = {
      case "concept" => concept.filter(col("concept_id") =!= 7)
      case "concept_reference_term" => conceptReferenceTerm.unionByName(
        Seq((58L, "126", 40L, 0))
          .toDF("concept_reference_term_id", "code", "concept_source_id", "retired"))
      case "concept_reference_map" => conceptReferenceMap.unionByName(
        Seq((3L, 30L, 58L))
          .toDF("concept_id", "concept_map_type_id", "concept_reference_term_id"))
      case other => conceptTables(other)
    }
    val kcfg = cfg.copy(conceptKeyMapping = Some("CIEL"))
    val out = ConceptsExport.withKeyMapping(
      ConceptsExport.wide(noComplex, kcfg), kcfg)
    // the guarded frame must be checkpoint-backed: downstream consumers
    // (edges, tree filter, ordered write) scan the materialized rows
    // instead of re-executing the multi-join wide plan per consumer
    assert(out.queryExecution.optimizedPlan.toString.startsWith("LogicalRDD"),
      s"guarded key-remap output should read a localCheckpoint, got:\n" +
        out.queryExecution.optimizedPlan.toString.take(500))
  }

  test("cli: csv ingress resolves <dir>/<table>.csv with header + inferred schema") {
    val tmp = Files.createTempDirectory("graft-cli-csv")
    val srcDir = tmp.resolve("tables"); Files.createDirectories(srcDir)
    locationTables.foreach { case (name, df) =>
      val d = srcDir.resolve(name + ".csv.d")
      df.coalesce(1).write.option("header", "true").mode("overwrite")
        .csv(d.toString)
      val part = Files.list(d).iterator.asScala
        .find(_.toString.endsWith(".csv")).get
      Files.move(part, srcDir.resolve(name + ".csv"))
    }
    val out = tmp.resolve("locations.csv").toString
    ExportCli.run(spark, "locations",
      Map("tables" -> s"csv:$srcDir", "out" -> out))
    val lines = Files.readAllLines(Paths.get(out)).asScala.toSeq
    assert(lines.head.startsWith("UUID,Void/Retire,Name,Description,Parent"))
    assert(lines.tail.map(_.split(",", -1).head) ==
      Seq("loc-1", "loc-2", "loc-3", "loc-4", "loc-5"))
  }

  test("config: key mapping validates SAME-AS and source membership up front") {
    intercept[IllegalArgumentException] {
      ConceptsConfig(mappingTypes = Seq("NARROWER-THAN"),
        conceptKeyMapping = Some("CIEL"))
    }
    intercept[IllegalArgumentException] {
      ConceptsConfig(conceptSources = Seq("PIH|Name"),
        conceptKeyMapping = Some("CIEL"))
    }
  }

  test("cli: --mapping-types and --set-name default output name round-trip") {
    assert(graft.functions.Naming.squishName("Vital signs") == "Vital-signs")
    // mapping-types narrows the pivot headers: NARROWER-THAN dropped.
    // Fixtures go through the parquet ingress (descriptions carry
    // embedded newlines, which a header-CSV round-trip can't hold).
    val tmp = Files.createTempDirectory("graft-cli")
    val srcDir = tmp.resolve("tables"); Files.createDirectories(srcDir)
    conceptTables.foreach { case (name, df) =>
      df.coalesce(1).write.mode("overwrite")
        .parquet(srcDir.resolve(name + ".parquet").toString)
    }
    val out = tmp.resolve("narrow.csv").toString
    ExportCli.run(spark, "concepts", Map(
      "tables" -> s"parquet:$srcDir", "out" -> out,
      "locales" -> "en,es", "sources" -> "PIH|Name,PIH|Number,CIEL",
      "mapping-types" -> "SAME-AS"))
    val header = Files.readAllLines(Paths.get(out)).asScala.head.split(",", -1).toSeq
    assert(header.exists(_.startsWith("Mappings|SAME-AS|")))
    assert(!header.exists(_.startsWith("Mappings|NARROWER-THAN|")),
      "--mapping-types SAME-AS should drop NARROWER-THAN columns")
  }
}
