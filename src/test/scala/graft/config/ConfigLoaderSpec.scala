package graft.config

import java.nio.file.{Files, Paths}

import graft.parse.OsrsPatterns
import org.scalatest.funsuite.AnyFunSuite

/** Parses the reference's OWN config files (read-only at /root/reference)
  * and checks the loaded config matches the hand-declared defaults —
  * proving a reference user's existing TOML drives this engine unchanged.
  */
class ConfigLoaderSpec extends AnyFunSuite {

  private def read(p: String) = new String(Files.readAllBytes(Paths.get(p)), "UTF-8")

  private lazy val refDir = "/root/reference/src"
  private lazy val available = Files.exists(Paths.get(s"$refDir/config.example.toml"))

  test("reference config.example.toml loads with the full pattern inventory") {
    assume(available)
    val root = Toml.parse(read(s"$refDir/config.example.toml"))
    val pc = ConfigLoader.parseConfig(root)

    // Group inventory: everything OsrsPatterns declares, same order, plus
    // the reference's bin variants we dropped (server-specific mention ids).
    val loadedGroups = pc.groups.map(g => g.name -> g.variants.size)
    val declared = OsrsPatterns.groups.map(g => g.name -> g.variants.size).toMap
    loadedGroups.foreach { case (name, n) =>
      declared.get(name).foreach { dn =>
        val expected = if (name == "bin") dn + 2 else dn
        assert(n == expected, s"group $name variant count")
      }
    }
    assert(pc.groups.map(_.name) == OsrsPatterns.groups.map(_.name))
    assert(pc.chatColumns == Seq("Rank", "Status", "Username", "Content"))

    // Regexes match the hand-declared ones variant by variant (bin tail
    // excluded) — the strongest "config drives the engine" check.
    OsrsPatterns.groups.filterNot(_.name == "bin").foreach { g =>
      val loaded = pc.groups.find(_.name == g.name).get
      assert(loaded.variants.map(_.regex) == g.variants.map(_.regex), g.name)
      assert(loaded.variants.map(_.columns) == g.variants.map(_.columns), g.name)
    }

    assert(ConfigLoader.mappingRules(root).exists(_.targetUsername == "zezima"))
  }

  test("reference dashboard settings load the 9+3+3 report set") {
    assume(available)
    val root = Toml.parse(read(s"$refDir/config.example.toml"))
    val dash = root("dashboard_settings").asInstanceOf[Toml.Table]
    val lbs = ConfigLoader.leaderboards(dash)
    assert(lbs.size == 9)
    assert(lbs.head.reportName == "valuable_drops_summary")
    assert(lbs.head.broadcastTypes ==
      Seq("Valuable Drop", "Raid Loot", "Clue Scroll Item"))
    assert(ConfigLoader.detailed(dash).size == 3)
    val ts = ConfigLoader.timeseries(dash)
    assert(ts.size == 3 && ts.head.frequencies == Seq("6h", "D", "W"))
  }

  test("historical TOMLs load records, blacklist shapes, and groups") {
    assume(available)
    val pb = ConfigLoader.pbHistorical(
      Toml.parse(read(s"$refDir/historical_personal_bests.example.toml")))
    assert(pb.records.nonEmpty)
    assert(pb.records.forall(_.task.nonEmpty))

    val clog = ConfigLoader.clogHistorical(
      Toml.parse(read(s"$refDir/historical_collection_logs.example.toml")))
    assert(clog.groups.nonEmpty)
    assert(clog.groups.forall(_._2.nonEmpty))
  }

  test("full pipeline config assembles from the three reference files") {
    assume(available)
    val cfg = ConfigLoader.pipelineConfig(
      read(s"$refDir/config.example.toml"),
      read(s"$refDir/historical_personal_bests.example.toml"),
      read(s"$refDir/historical_collection_logs.example.toml"))
    assert(cfg.leaderboards.size == 9)
    assert(cfg.clog.sourceTypes.contains("Collection Log"))
    assert(cfg.pb.similarityThresholdSeconds == 0.6)
    assert(cfg.pb.groupingWindowSeconds == 15L)
    assert(!cfg.pb.allowMultipleHolders)
    assert(cfg.recent.limitPerType == 15)
    assert(cfg.customLookbackDays == 14)
  }
}
