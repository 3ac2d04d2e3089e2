package graft.brotli

import org.scalatest.funsuite.AnyFunSuite

/** Encoder-side §8 static dictionary (identity transform): index
  * integrity, reference emission on dictionary-wordy payloads, and
  * decode parity with both our decoder and native libbrotli. */
class DictEncodeSpec extends AnyFunSuite {
  import SpecData.{Dictionary, Transforms}

  test("identity transform maps words to themselves") {
    for (len <- Seq(4, 8, 16, 24); idx <- Seq(0, 1, 7)) {
      val w = Dictionary.word(len, idx)
      assert(java.util.Arrays.equals(Transforms(DictIndex.identityId, w), w))
    }
  }

  test("index lookup finds every word by content; misses cleanly") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 500) {
      val len = DictIndex.MinLen + rnd.nextInt(DictIndex.MaxLen - DictIndex.MinLen + 1)
      val idx = rnd.nextInt(1 << Dictionary.sizeBits(len))
      val w = Dictionary.word(len, idx)
      val found = DictIndex.lookup(len, DictIndex.hash(w, 0, len), w, 0)
      assert(found >= 0, s"word ($len,$idx) not found")
      // duplicates resolve to the smallest index with identical bytes
      assert(java.util.Arrays.equals(Dictionary.word(len, found), w))
    }
    val junk = { val b = new Array[Byte](24); rnd.nextBytes(b); b }
    assert(DictIndex.lookup(24, DictIndex.hash(junk, 0, 24), junk, 0) == -1)
  }

  test("q11 emits dictionary references worth real bits on wordy text") {
    // distinct dictionary words used once each, separated by a byte that
    // appears in no word — LZ77 finds almost nothing, so any large win
    // over the q6 encode can only come from §8 references
    val rnd = new scala.util.Random(11)
    val words = (0 until 400).map { _ =>
      val len = 8 + rnd.nextInt(9)
      Dictionary.word(len, rnd.nextInt(1 << Dictionary.sizeBits(len)))
    }
    val bos = new java.io.ByteArrayOutputStream()
    words.foreach { w => bos.write(w); bos.write(0) }
    val data = bos.toByteArray
    val enc11 = Brotli.compress(data, 11)
    val enc6 = Brotli.compress(data, 6)
    assert(java.util.Arrays.equals(Brotli.decompress(enc11), data))
    assert(enc11.length < enc6.length * 0.8,
      s"q11 ${enc11.length}B should beat q6 ${enc6.length}B by >20% via §8 refs")
  }

  test("affix + ferment transforms compress capitalized prose units") {
    // distinct dictionary words as sentence-ish units: "Word. Next. …"
    // — identity alone covers only the lowercase core, so beating q6 by
    // a wide margin requires the ferment-first ('W') and suffix ('. ')
    // transform matching to fire
    val rnd = new scala.util.Random(17)
    val sb = new StringBuilder
    for (_ <- 0 until 1500) {
      val len = 6 + rnd.nextInt(10)
      val w = new String(Dictionary.word(len, rnd.nextInt(1 << Dictionary.sizeBits(len))),
        java.nio.charset.StandardCharsets.ISO_8859_1)
      if (w.forall(c => c >= 'a' && c <= 'z')) {
        sb.append(w.substring(0, 1).toUpperCase).append(w.substring(1)).append(". ")
      }
    }
    val data = sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assume(data.length > 1000)
    val enc11 = Brotli.compress(data, 11)
    val enc6 = Brotli.compress(data, 6)
    assert(java.util.Arrays.equals(Brotli.decompress(enc11), data))
    assert(enc11.length < enc6.length * 0.8,
      s"q11 ${enc11.length}B should beat q6 ${enc6.length}B via transform refs")
  }

  test("native libbrotli decodes our dictionary-referencing streams") {
    val cli = new java.io.File("tools/brotli_cli")
    assume(cli.canExecute)
    val rnd = new scala.util.Random(13)
    val sb = new StringBuilder
    while (sb.length < 200000) {
      val len = 5 + rnd.nextInt(12)
      val w = Dictionary.word(len, rnd.nextInt(1 << Dictionary.sizeBits(len)))
      sb.append(new String(w, java.nio.charset.StandardCharsets.ISO_8859_1))
      sb.append(' ')
    }
    val data = sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val enc = Brotli.compress(data, 11)
    import scala.sys.process._
    val out = new java.io.ByteArrayOutputStream()
    val io = new ProcessIO(
      in => { in.write(enc); in.close() },
      os => { val buf = new Array[Byte](1 << 16)
        var n = os.read(buf); while (n > 0) { out.write(buf, 0, n); n = os.read(buf) }
        os.close() },
      _.close())
    val p = Process(Seq(cli.getPath, "d")).run(io)
    assert(p.exitValue() == 0)
    assert(java.util.Arrays.equals(out.toByteArray, data))
  }
}
