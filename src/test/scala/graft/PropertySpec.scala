package graft

import graft.archive.Archive
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import java.time.Instant

/** Property-based checks (SURVEY §5.3) for the pure parity functions —
  * runs under ScalaCheck's own sbt test framework. */
object PropertySpec extends Properties("archive") {

  property("sanitize is idempotent, quote-free, length-preserving") =
    forAll { (s: String) =>
      val once = Archive.sanitize(s)
      !once.contains("'") &&
        Archive.sanitize(once) == once &&
        once.length == s.length
    }

  private val clocks: Gen[Instant] =
    Gen.choose(0L, 4102444800000L).map(Instant.ofEpochMilli)

  property("archiveName carries a 12-digit prefix and round-trips") =
    forAll(clocks, Gen.alphaNumStr) { (clock, name) =>
      val archived = Archive.archiveName(name, clock)
      val prefix = archived.takeWhile(_ != '_')
      prefix.length == 12 && prefix.forall(_.isDigit) &&
        archived == s"${prefix}_${Archive.sanitize(name)}"
    }

  property("flagIsTrue accepts exactly case-insensitive 'true'") =
    forAll { (s: String) =>
      Archive.flagIsTrue(s) == (s != null && s.equalsIgnoreCase("true"))
    }

  property("rolling fingerprint stays within [0, 1e9+7) and is stable") =
    forAll(Gen.asciiPrintableStr) { (s: String) =>
      val h = s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)
      val h2 = s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)
      h == h2 && h >= 0 && h < 1000000007L
    }
}
