package graft.delta

import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based partition-value codec checks (the survey's suggested
  * ScalaCheck upgrade over the reference's example-based tests):
  * serialize ∘ deserialize must be identity on the partition-string
  * domain for every primitive type. (Raw ScalaCheck generators with
  * seeded sampling — the scalatest bridge isn't in the offline cache.)
  */
class PartitionValuesProps extends AnyFunSuite {

  private def forAll(gen: Gen[Any])(check: Any => Unit): Unit = {
    var seed = Seed(42L)
    (1 to 200).foreach { _ =>
      gen.apply(Gen.Parameters.default, seed).foreach(check)
      seed = seed.next
    }
  }

  private def roundtrips(dt: DataType, gen: Gen[Any]): Unit =
    forAll(gen) { v =>
      val s = PartitionValues.serialize(v, dt)
      val back = PartitionValues.deserialize(s, dt)
      val s2 = PartitionValues.serialize(back, dt)
      assert(s == s2, s"value $v: serialized $s re-serialized as $s2")
    }

  test("long roundtrip")(roundtrips(LongType, Gen.long))
  test("int roundtrip")(roundtrips(IntegerType, Gen.chooseNum(Int.MinValue, Int.MaxValue)))
  test("boolean roundtrip")(roundtrips(BooleanType, Gen.oneOf(true, false)))
  test("string roundtrip")(
    roundtrips(StringType, Gen.asciiPrintableStr.suchThat(_.nonEmpty)))

  test("date roundtrip")(roundtrips(DateType,
    Gen.chooseNum(-100000L, 100000L).map(LocalDate.ofEpochDay)))

  test("timestamp roundtrip (micro precision)")(roundtrips(TimestampType,
    Gen.chooseNum(-62135596800L, 253402300799L).flatMap(sec =>
      Gen.chooseNum(0L, 999999L).map(us =>
        Instant.ofEpochSecond(sec, us * 1000L)))))

  test("timestamp_ntz roundtrip")(roundtrips(TimestampNTZType,
    Gen.chooseNum(0L, 253402300799L).flatMap(sec =>
      Gen.chooseNum(0L, 999999L).map(us =>
        LocalDateTime.ofEpochSecond(sec, us.toInt * 1000, ZoneOffset.UTC)))))

  test("decimal roundtrip")(roundtrips(DecimalType(20, 4),
    for {
      unscaled <- Gen.chooseNum(-1000000000000L, 1000000000000L)
    } yield new java.math.BigDecimal(java.math.BigInteger.valueOf(unscaled), 4)))

  test("deserialize matches the reference's examples") {
    // filter_by_meta.py:13-42 / PROTOCOL.md partition-value examples
    assert(PartitionValues.deserialize("2021-09-08", DateType) ==
      LocalDate.parse("2021-09-08"))
    assert(PartitionValues.deserialize("2021-09-08 11:11:11", TimestampType) ==
      LocalDateTime.parse("2021-09-08T11:11:11").toInstant(ZoneOffset.UTC))
    assert(PartitionValues.deserialize("true", BooleanType) == true)
    assert(PartitionValues.deserialize("1", BooleanType) == true)
    assert(PartitionValues.deserialize("no", BooleanType) == false)
    assert(PartitionValues.deserialize("12.34", DecimalType(4, 2)) ==
      new java.math.BigDecimal("12.34"))
  }

  test("serialize trims trailing fraction zeros like the reference") {
    // filter_by_meta.py:58-60: strftime(...%f) rstrip('0') rstrip('.')
    val t = LocalDateTime.parse("2021-09-08T11:11:11")
    assert(PartitionValues.serialize(t, TimestampNTZType) == "2021-09-08 11:11:11")
    val t2 = LocalDateTime.parse("2021-09-08T11:11:11.500")
    assert(PartitionValues.serialize(t2, TimestampNTZType) == "2021-09-08 11:11:11.5")
  }
}
