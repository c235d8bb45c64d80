package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.codec.CanalCodec

/** Property tests for the Canal codec (SURVEY.md §5 item 1): random
  * field values — including commas, quotes, unicode, and SQL NULLs —
  * survive the decode→project pipeline exactly. This is precisely
  * where the reference's CSV round-trip corrupted data (commas split
  * fields, nulls became the string "null"). Uses seeded ScalaCheck
  * generators directly (deterministic; no scalatestplus bridge in the
  * offline cache).
  */
class CanalPropertySpec extends SparkSpec {
  import spark.implicits._

  private val weird: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(20)),
    Gen.const("a,b,c"), Gen.const("comma, inside"), Gen.const(""),
    Gen.const("汉字值"), Gen.const("line1 line2"), Gen.const("quo\\\"te"))

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("random meeting codes (commas, unicode, quotes) round-trip exactly") {
    val gen = Gen.listOfN(8, Gen.zip(Gen.choose(1, 100000), weird))
    samples(gen, 15).foreach { rows =>
      val distinctRows = rows.toMap.toList
      val json = distinctRows.map { case (id, code) =>
        s"""{"data":[{"id":"$id","meeting_code":"${esc(code)}","address_id":"1",
           |"mstart_date":"2024-05-01 09:00:00","mend_date":"2024-05-01 10:00:00"}],
           |"database":"d","es":1,"id":1,"isDdl":false,"table":"t_meeting_info",
           |"ts":1,"type":"INSERT"}""".stripMargin.replace("\n", "")
      }
      val got = CanalCodec.meetingPipeline(json.toDF("value"))
        .select("meeting_id", "meeting_code")
        .as[(Int, String)].collect().toMap
      assert(got === distinctRows.toMap)
    }
  }

  test("null fields decode to SQL nulls, never the string \"null\"") {
    samples(Gen.choose(1, 1000), 5).foreach { id =>
      val json = Seq(
        s"""{"data":[{"id":"$id","meeting_code":null,"address_id":null,
           |"mstart_date":null,"mend_date":null}],"database":"d","es":1,"id":1,
           |"isDdl":false,"table":"t_meeting_info","ts":1,"type":"UPDATE"}"""
          .stripMargin.replace("\n", "")).toDF("value")
      val r = CanalCodec.meetingPipeline(json).collect().head
      assert(r.getAs[Int]("meeting_id") === id)
      assert(r.isNullAt(r.fieldIndex("meeting_code")))
      assert(r.isNullAt(r.fieldIndex("address_id")))
      assert(r.isNullAt(r.fieldIndex("mstart_date")))
    }
  }
}
