package graft.core

import java.nio.file.Files

import graft.SparkSpec

class SyncConfigSpec extends SparkSpec {

  test("parses the reference's config.json shape into typed specs") {
    val json =
      """{ "period": 2,
        |  "syncs": [
        |    { "name": "bogus_sync", "id_col": "id", "date_col": "date",
        |      "version_col": "version", "filter_date": true,
        |      "ignore_same_source": true, "day_col": "_day",
        |      "cassandra": { "table": "test.bogus", "source_id": "CASSANDRA" },
        |      "elasticsearch": { "index": "bogus", "source_id": "Elastic" } },
        |    { "name": "minimal",
        |      "cassandra": { "table": "t" },
        |      "elasticsearch": { "index": "i" } } ] }""".stripMargin
    val p = Files.createTempDirectory("cfg").resolve("config.json")
    Files.writeString(p, json)

    val cfg = SyncConfig.load(spark, p.toString)
    cfg.periodSeconds shouldBe 120
    cfg.syncs.length shouldBe 2

    val s = cfg.syncs.head
    s.name shouldBe "bogus_sync"
    s.left shouldBe SideSpec("test.bogus", Some("CASSANDRA"))
    s.right shouldBe SideSpec("bogus", Some("Elastic"))
    s.filterDate shouldBe true
    s.ignoreSameSource shouldBe true
    s.dayCol shouldBe Some("_day")

    val m = cfg.syncs(1)
    m.idCol shouldBe "id" // defaults
    m.filterDate shouldBe false
    m.left.sourceId shouldBe None
    m.dayCol shouldBe None
  }
}
