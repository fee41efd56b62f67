package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{Observe, Sinks}
import graft.sources.Tables

class SinksObserveSpec extends GraftSpec {
  import spark.implicits._

  test("httpResponse shapes the reference's response record") {
    val df = Seq((200, "hi", true)).toDF("code", "phrase", "pers")
    val out = df.select(Sinks.httpResponse(
      struct($"phrase", $"pers".as("is_personalized")),
      $"code", map(lit("X-Extra"), lit("1"))).as("r"))
      .select($"r.statusCode", $"r.headers", $"r.body").collect()(0)
    assert(out.getString(0) == "200")
    val headers = out.getMap[String, String](1)
    assert(headers("Content-Type") == "application/json")
    assert(headers("X-Extra") == "1")
    assert(out.getString(2).contains("\"is_personalized\":true"))
  }

  test("writeJsonResponses partitions by status code and round-trips") {
    val dir = Files.createTempDirectory("graft_sink").toString
    val df = Seq((200, "ok"), (400, "bad"), (200, "fine")).toDF("code", "msg")
    Sinks.writeJsonResponses(df,
      Sinks.httpResponse(struct($"msg"), $"code", map()), dir)
    val back = spark.read.text(s"$dir/statusCode=200")
    assert(back.count() == 2)
    assert(spark.read.text(s"$dir/statusCode=400").count() == 1)
  }

  test("writePartitioned lays out parquet by partition columns") {
    val dir = Files.createTempDirectory("graft_part").toString
    val ev = Tables.events(spark, sfTiny)
      .select($"event_id", $"event_type", $"value")
    Sinks.writePartitioned(ev, dir, Seq("event_type"))
    val back = spark.read.parquet(dir)
    assert(back.count() == ev.count())
    // partition pruning: reading one event_type touches one directory
    val types = ev.select($"event_type").distinct().as[String].collect()
    val one = spark.read.parquet(dir)
      .filter($"event_type" === types.head)
    assert(one.count() ==
      ev.filter($"event_type" === types.head).count())
  }

  test("observe collects in-job metrics without a second pass") {
    val (df, obs) = Observe.withMetrics(
      Tables.events(spark, sfTiny),
      "ev_metrics",
      Seq(count(lit(1)).as("n"), sum($"value").as("total"),
        count(when($"event_type" === "error", 1)).as("n_errors")))
    val total = df.count()
    val row = obs.get
    assert(row("n") == total)
    assert(row("n_errors").asInstanceOf[Long] >= 0L)
  }
}
