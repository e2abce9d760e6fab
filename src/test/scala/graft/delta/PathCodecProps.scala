package graft.delta

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property checks of the add.path codec (encodePath / decodePath /
  * resolvePath) — the invariants the scan, the writer AND shallow
  * clones (absolute URIs) lean on. Same raw-ScalaCheck harness as
  * PartitionValuesProps.
  */
class PathCodecProps extends AnyFunSuite {

  private def forAll(gen: Gen[String])(check: String => Unit): Unit = {
    var seed = Seed(1337L)
    (1 to 300).foreach { _ =>
      gen.apply(Gen.Parameters.default, seed).foreach(check)
      seed = seed.next
    }
  }

  // filename-ish segments, biased toward the characters that bite:
  // '%', '+', space, '=', unicode, and hive-escape sequences
  private val segment: Gen[String] = Gen.oneOf(
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString),
    Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('%', '+', ' ', '=', '-', '.', '圆', 'é')))
      .map(_.mkString))

  private val relPath: Gen[String] =
    Gen.choose(1, 3).flatMap(n =>
      Gen.listOfN(n, segment).map(_.mkString("/")))

  test("decodePath ∘ encodePath is identity on path strings") {
    forAll(relPath) { p =>
      val enc = DeltaWriter.encodePath(p)
      assert(DeltaScan.decodePath(enc) == p, s"roundtrip broke for '$p'")
      // the encoded form is what the log stores: it must never contain
      // a raw space (the URI form other readers expect)
      assert(!enc.contains(" "), s"unencoded space in '$enc'")
    }
  }

  test("resolvePath prefixes relative paths and decodes them") {
    forAll(relPath) { p =>
      val enc = DeltaWriter.encodePath(p)
      assert(DeltaScan.resolvePath("/tbl", enc) == s"/tbl/$p")
    }
  }

  test("resolvePath keeps scheme+authority, decodes the path component") {
    forAll(relPath) { p =>
      val enc = DeltaWriter.encodePath(s"/data/$p")
      val resolved = DeltaScan.resolvePath("/tbl", s"s3a://bucket$enc")
      assert(resolved == s"s3a://bucket/data/$p",
        s"absolute URI mangled: '$resolved' for '$p'")
    }
  }

}
