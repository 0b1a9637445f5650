package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipelines.Sparkify

/** End-to-end parity tests for the Sparkify pipeline against the semantic
  * invariants measured from the reference's golden outputs (SURVEY.md §1,
  * §5; FIXTURES.md §B). */
class SparkifySpec extends AnyFunSuite {
  import TestSpark._

  private lazy val outDir: String = {
    val in = Files.createTempDirectory("sparkify_in").toString
    val out = Files.createTempDirectory("sparkify_out").toString
    SparkifyFixtures.write(in)
    Sparkify.run(spark, Sparkify.Config(in, out))
    out
  }
  private def read(t: String) = spark.read.parquet(s"$outDir/$t")

  test("songs: distinct rows, partitioned by year/artist_id") {
    val songs = read("songs")
    assert(songs.count() === 3) // duplicate SO1 file collapsed
    assert(songs.columns.toSet ===
      Set("song_id", "title", "duration", "year", "artist_id"))
    // partition dirs exist (dynamic-partition write, etl.py:46-48)
    assert(Files.exists(java.nio.file.Paths.get(s"$outDir/songs/year=1994")))
  }

  test("songs leaf-file glob read drops partition columns (etl.py:139 quirk)") {
    val globRead = spark.read.parquet(s"$outDir/songs/*/*/*")
    assert(globRead.columns.toSeq.sorted === Seq("duration", "song_id", "title"))
  }

  test("artists: aliased projection, distinct") {
    val artists = read("artists")
    assert(artists.columns.toSet ===
      Set("artist_id", "name", "location", "latitude", "longitude"))
    assert(artists.count() === 3)
  }

  test("users: one row per (user, level) — upgrades keep both rows") {
    val users = read("users")
    val u10 = users.where(col("user_id") === "10")
    assert(u10.count() === 2, "user 10 appears under free AND paid")
    assert(users.count() === 4)
  }

  test("time: one row per NextSong event (no distinct), seconds truncated") {
    val time = read("time")
    assert(time.count() === 6) // 7 events - 1 non-NextSong
    // 1542241826123 and ...826623 both truncate to :26.000
    val dupSecond = time.groupBy("start_time").count()
      .where(col("count") === 2)
    assert(dupSecond.count() === 1)
    val subSecond = time.where(
      (unix_micros(col("start_time")) % 1000000L) =!= 0).count()
    assert(subSecond === 0, "start_time must be whole-second")
  }

  test("time: weekday is the full English day name (UDF U1 via date_format)") {
    val time = read("time")
    val w = time.select("weekday").distinct().collect().map(_.getString(0)).toSet
    assert(w === Set("Thursday")) // 2018-11-15 UTC
  }

  test("songplays: matched, location-matched, and NULL-artist rows") {
    val sp = read("songplays")
    assert(sp.columns.toSet === Set("start_time", "user_id", "level",
      "song_id", "artist_id", "session_id", "location", "user_agent",
      "year", "month"))
    // title 'Setanta matins' matches SO1 and SO3 -> 2 artist-side rows for
    // the t0 event (AR1 by name for both song matches); duplicated-second
    // event collapsed by distinct into the same start_time... but distinct
    // keeps both song_ids. Assert the NULL-artist row survived:
    assert(sp.where(col("artist_id").isNull).count() > 0)
    // and the location-only match resolved AR1 (Dubai UAE)
    val byLoc = sp.where(col("location") === "Dubai UAE")
      .select("artist_id").collect().map(_.getString(0)).toSet
    assert(byLoc === Set("AR1"))
    // year/month come from the time table
    assert(sp.select("year").distinct().collect().map(_.getInt(0)).toSeq === Seq(2018))
  }

  test("songplays: OR-join rewrite and verbatim OR predicate agree") {
    val in2 = Files.createTempDirectory("sparkify_in2").toString
    val out2 = Files.createTempDirectory("sparkify_out2").toString
    SparkifyFixtures.write(in2)
    Sparkify.run(spark, Sparkify.Config(in2, out2, rewriteOrJoin = false))
    def canon(dir: String) = {
      val df = spark.read.parquet(s"$dir/songplays")
      val cols = df.columns.sorted.toSeq
      df.select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
    }
    assert(canon(outDir) === canon(out2))
  }

  test("explicit schemas reproduce schema-inference results (parity mode)") {
    val in3 = Files.createTempDirectory("sparkify_in3").toString
    val out3 = Files.createTempDirectory("sparkify_out3").toString
    SparkifyFixtures.write(in3)
    Sparkify.run(spark, Sparkify.Config(in3, out3, inferSchema = true))
    def canon(dir: String, t: String) = {
      val df = spark.read.parquet(s"$dir/$t")
      val cols = df.columns.sorted.toSeq
      df.select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
    }
    for (t <- Seq("songs", "artists", "users", "time", "songplays"))
      assert(canon(outDir, t) === canon(out3, t), s"table $t diverged")
  }

  test("timestamp truncation matches the reference expression chain") {
    import spark.implicits._
    val got = Seq(1542241826123L).toDF("ts")
      .select(Sparkify.tsTimestamp(col("ts")).as("t"))
      .select(date_format(col("t"), "yyyy-MM-dd HH:mm:ss.SSS"))
      .as[String].head()
    assert(got === "2018-11-15 00:30:26.000") // ms truncated (SURVEY §1)
  }
}
