package graft.codec

import java.io.{ByteArrayOutputStream, InputStream, OutputStream}

import org.apache.hadoop.conf.{Configurable, Configuration}
import org.apache.hadoop.io.compress._

import graft.brotli.{BrotliDecoder, BrotliEncoder}

/** Hadoop `CompressionCodec` for `.bro` Brotli streams, pure JVM — the
  * Spark-native re-provision of the reference's entire capability surface
  * (BroCodec.java:18: `Configurable, CompressionCodec`). Registered via
  * `spark.hadoop.io.compression.codecs`, it makes every Spark text-based
  * source/sink (`text`, `csv`, `json`) read and write `.bro` transparently.
  *
  * Config parity with the reference (BroCodec.java:22-30):
  *   - `bro.quality` (default 6; 0-11 standard ladder, 12 = graft's
  *     max-ratio extension — q11's zopfli parse with copy-boundary
  *     relaxation, ~100% of native q11's ratio (6.265 vs 6.25, r10
  *     measured) at ~30% lower encode speed; streams stay RFC
  *     7932-standard either way)
  *   - `bro.buffer-size` (default 2 MiB)
  *   - extension `.bro` (BroCodec.java:57-59)
  *
  * Contract fixes over the reference (SURVEY.md §2.C.7): real
  * `getBytesRead`/`getBytesWritten` (theirs return 0,
  * BroCompressor.java:84-91) and a real `Decompressor.reset()` (theirs is
  * a no-op, BroDecompressor.java:130-131 — a CodecPool corruption bug).
  *
  * Scale note (SURVEY.md §4.2): like the reference, `.bro` files are
  * non-splittable — one Spark task per file — so the writer-side layout
  * rule at 100 TB is many medium files (see `BroWriter`).
  */
class BrotliCodec extends Configurable with CompressionCodec {
  import BrotliCodec._

  private var conf: Configuration = _
  private var quality: Int = DefaultQuality
  private var bufferSize: Int = DefaultBufferSize
  private var dictionary: Array[Byte] = Array.emptyByteArray

  override def setConf(c: Configuration): Unit = {
    conf = c
    quality = c.getInt(QualityKey, DefaultQuality)
    bufferSize = c.getInt(BufferSizeKey, DefaultBufferSize)
    dictionary = loadDictionary(c)
  }
  override def getConf: Configuration = conf

  override def createCompressor(): Compressor = new BrotliCompressor(quality)
  override def getCompressorType: Class[_ <: Compressor] = classOf[BrotliCompressor]
  override def createDecompressor(): Decompressor = new BrotliDecompressor()
  override def getDecompressorType: Class[_ <: Decompressor] = classOf[BrotliDecompressor]

  // The dictionary is (re-)applied at stream construction, which is also
  // the CodecPool seam: pooled (de)compressors arrive reset, so the
  // preload must happen per stream, not per object.
  override def createOutputStream(out: OutputStream): CompressionOutputStream =
    createOutputStream(out, createCompressor())
  override def createOutputStream(out: OutputStream, c: Compressor): CompressionOutputStream = {
    // quality is also per-stream state: a pooled compressor arrives with
    // its CONSTRUCTION-time quality (CodecPool pools by compressor class,
    // so parquet-mr's per-quality codec instances would otherwise share
    // one stale compressor) — re-apply the codec's current quality first,
    // then the dictionary (the quality change resets the encoder)
    c match {
      case bc: BrotliCompressor =>
        bc.setQuality(quality)
        // always normalize, mirroring createInputStream: an empty codec
        // dictionary must CLEAR any stale preload a reused compressor
        // carries — a dict-preloaded encoder emits preload-reaching
        // distances a dict-less reader misreads as §8 static-dictionary
        // references ("invalid dictionary copy length")
        bc.normalizeDictionary(dictionary)
      case other =>
        if (dictionary.nonEmpty) other.setDictionary(dictionary, 0, dictionary.length)
    }
    new CompressorStream(out, c, bufferSize)
  }

  override def createInputStream(in: InputStream): CompressionInputStream =
    createInputStream(in, createDecompressor())
  override def createInputStream(in: InputStream, d: Decompressor): CompressionInputStream = {
    d match {
      // always normalize (len 0 clears a pooled instance's stale dict)
      case bd: BrotliDecompressor => bd.setDictionary(dictionary, 0, dictionary.length)
      case other => if (dictionary.nonEmpty)
        other.setDictionary(dictionary, 0, dictionary.length)
    }
    new DecompressorStream(in, d, bufferSize)
  }

  override def getDefaultExtension: String = ".bro"
}

object BrotliCodec {
  val QualityKey = "bro.quality"
  val BufferSizeKey = "bro.buffer-size"

  /** Path (any Hadoop filesystem) to a shared compression dictionary.
    * When set, every `.bro` stream this codec produces or consumes is
    * dictionary-compressed — Spark-reachable custom dictionaries, the
    * feature the reference's README marks TODO. The SAME file must be
    * configured on write and read; at cluster scale it lives on the
    * shared FS and every executor task reads it once (cached below). */
  val DictionaryFileKey = "bro.dictionary.file"

  val DefaultQuality = 6
  val DefaultBufferSize: Int = 1024 * 2048

  // per-JVM cache: one read per dictionary artifact per executor, not
  // per task. Keyed by (path, length, mtime) so a retrained artifact
  // overwritten in place is re-read, not served stale.
  private val dictCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()

  private def loadDictionary(conf: Configuration): Array[Byte] = {
    val path = conf.getTrimmed(DictionaryFileKey, "")
    if (path.isEmpty) Array.emptyByteArray
    else {
      val hp = new org.apache.hadoop.fs.Path(path)
      val fs = hp.getFileSystem(conf)
      val st = fs.getFileStatus(hp)
      val key = s"$path:${st.getLen}:${st.getModificationTime}"
      dictCache.computeIfAbsent(key, _ => {
        val in = fs.open(hp)
        try in.readAllBytes() finally in.close()
      })
    }
  }
}

/** Push-side Hadoop state machine over [[BrotliEncoder]]
  * (contract of BroCompressor.java:63-148, pure JVM). */
class BrotliCompressor(initialQuality: Int) extends Compressor {
  private var quality = initialQuality
  private var encoder = new BrotliEncoder(quality)

  /** Pool seam (see `BrotliCodec.createOutputStream`): re-arm a pooled
    * instance with the owning codec's quality. A change discards any
    * in-flight encoder state, so this must only run at stream
    * construction — exactly where the dictionary is re-applied too. */
  private[codec] def setQuality(q: Int): Unit =
    if (q != quality) { quality = q; reset() }

  /** Pool seam, dictionary half: make the encoder's preload match the
    * codec's dictionary exactly — apply it when non-empty, and RESET
    * away any stale preload when empty (the decompressor side has had
    * this normalize-always rule since the pool was introduced). */
  private[codec] def normalizeDictionary(dict: Array[Byte]): Unit = {
    if (encoder.hasPreload) reset()
    if (dict.nonEmpty) setDictionary(dict, 0, dict.length)
  }
  private val pending = new ByteArrayOutputStream(1 << 16)
  private var pendingBuf: Array[Byte] = Array.emptyByteArray
  private var pendingPos = 0
  private var slab: Array[Byte] = _
  private var slabOff = 0
  private var slabLen = 0
  private var finishing = false
  private var bytesRead = 0L
  private var bytesWritten = 0L

  override def setInput(b: Array[Byte], off: Int, len: Int): Unit = {
    slab = b; slabOff = off; slabLen = len
  }

  override def needsInput(): Boolean =
    slabLen == 0 && pendingPos >= pendingBuf.length && !finishing

  /** Shared-dictionary support — the reference's sole TODO
    * (README.md:4-5; its Java layer no-ops this,
    * BroCompressor.java:79-81). Prefix semantics: see
    * [[graft.brotli.BrotliEncoder.setDictionary]]. */
  override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit =
    encoder.setDictionary(b, off, len)
  override def getBytesRead: Long = bytesRead
  override def getBytesWritten: Long = bytesWritten
  override def finish(): Unit = finishing = true
  override def finished(): Boolean =
    encoder.finished && pendingPos >= pendingBuf.length

  private def refillPending(): Unit =
    if (pendingPos >= pendingBuf.length && pending.size() > 0) {
      pendingBuf = pending.toByteArray
      pending.reset()
      pendingPos = 0
    }

  override def compress(b: Array[Byte], off: Int, len: Int): Int = {
    if (slabLen > 0) {
      encoder.write(slab, slabOff, slabLen, pending)
      bytesRead += slabLen
      slabLen = 0
    }
    if (finishing && !encoder.finished) encoder.finish(pending)
    refillPending()
    val n = math.min(len, pendingBuf.length - pendingPos)
    if (n > 0) {
      System.arraycopy(pendingBuf, pendingPos, b, off, n)
      pendingPos += n
      bytesWritten += n
    }
    n
  }

  override def reset(): Unit = {
    encoder = new BrotliEncoder(quality)
    pending.reset(); pendingBuf = Array.emptyByteArray; pendingPos = 0
    slab = null; slabOff = 0; slabLen = 0
    finishing = false; bytesRead = 0; bytesWritten = 0
  }

  override def end(): Unit = reset()
  override def reinit(conf: Configuration): Unit = {
    // Hadoop's CodecPool.getCompressor(codec, conf) seam: a non-null
    // conf re-binds quality before the reset re-creates the encoder
    if (conf != null)
      quality = conf.getInt(BrotliCodec.QualityKey, quality)
    reset()
  }
}

/** Pull-side Hadoop state machine over [[BrotliDecoder]]
  * (contract of BroDecompressor.java:84-122, pure JVM, with a real
  * `reset()`).
  *
  * Concatenated members come for free: Hadoop's `DecompressorStream`
  * implements the multi-member protocol itself — on `finished()` with
  * `getRemaining() == 0` it reads further file bytes, and with a
  * leftover it calls `reset()` and re-feeds the tail slice — so honest
  * `finished`/`getRemaining`/`reset` contracts (the reference hard-codes
  * 0 and no-ops reset) make `cat a.bro b.bro` readable with no extra
  * machinery. `reset()` re-arms the configured dictionary precisely so
  * that mid-file member rollover keeps decoding dictionary-compressed
  * members; pool reuse is safe because `createInputStream` re-normalizes
  * the dictionary (including clearing it) per stream. */
class BrotliDecompressor extends Decompressor {
  private var decoder = new BrotliDecoder()
  private var dict: Array[Byte] = Array.emptyByteArray
  private var bytesRead = 0L

  override def setInput(b: Array[Byte], off: Int, len: Int): Unit = {
    decoder.addInput(b, off, len)
    bytesRead += len
  }

  override def needsInput(): Boolean = decoder.needsInput
  /** Shared-dictionary support (see [[graft.brotli.BrotliDecoder.setDictionary]];
    * reference no-op: BroDecompressor.java:64-66). Length 0 clears. */
  override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit = {
    dict = java.util.Arrays.copyOfRange(b, off, off + len)
    decoder.setDictionary(b, off, len)
  }
  override def needsDictionary(): Boolean = false
  override def finished(): Boolean = decoder.isFinished

  override def decompress(b: Array[Byte], off: Int, len: Int): Int =
    decoder.decode(b, off, len)

  /** Real unconsumed-input count (reference contract:
    * BroDecompressor.java:125-127; needed for concatenated-stream
    * consumers — was hard-coded 0 in rounds 1-2). */
  override def getRemaining: Int = decoder.remainingInput

  override def reset(): Unit = {
    decoder = new BrotliDecoder()
    // keep and re-arm the dictionary: Hadoop's member-rollover protocol
    // calls reset() mid-file, and subsequent members share the stream's
    // dictionary. A pooled instance reused for a dictionary-less stream
    // is re-normalized by createInputStream (setDictionary with len 0).
    if (dict.nonEmpty) decoder.setDictionary(dict, 0, dict.length)
    bytesRead = 0
  }

  override def end(): Unit = reset()
}
