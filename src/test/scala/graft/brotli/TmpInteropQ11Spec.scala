package graft.brotli

import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayOutputStream
import scala.sys.process._

class TmpInteropQ11Spec extends AnyFunSuite {
  private def run(args: Seq[String], input: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val io = new ProcessIO(
      in => { in.write(input); in.close() },
      os => { val buf = new Array[Byte](1 << 16)
        var n = os.read(buf); while (n > 0) { out.write(buf, 0, n); n = os.read(buf) }
        os.close() },
      _.close())
    val p = Process(args).run(io)
    assert(p.exitValue() == 0, s"${args.mkString(" ")} failed")
    out.toByteArray
  }
  test("external libbrotli decodes graft q10/q11 streams") {
    val cli = "tools/brotli_cli"
    assume(new java.io.File(cli).canExecute)
    val words = Array("the", "of", "and", "information", "public", "that",
      "government", "different", "management", "The first", "because")
    val rnd = new scala.util.Random(42)
    val sb = new StringBuilder
    while (sb.length < 2500000) {
      sb.append(words(rnd.nextInt(words.length)))
      sb.append(if (rnd.nextInt(12) == 0) ".\n" else " ")
    }
    val text = sb.toString.getBytes("UTF-8")
    val rep = Array.tabulate(2000000)(i => ((i % 251) ^ (i / 1024)).toByte)
    val rand = { val b = new Array[Byte](300000); rnd.nextBytes(b); b }
    val zeros = new Array[Byte](3 << 20)
    for (q <- Seq(10, 11); (name, data) <- Seq("text" -> text, "rep" -> rep,
        "random" -> rand, "zeros" -> zeros)) {
      val enc = Brotli.compress(data, q)
      val dec = run(Seq(cli, "d"), enc)
      assert(java.util.Arrays.equals(dec, data),
        s"external decode mismatch: q=$q $name (${enc.length}B)")
    }
  }
}
