package graft.ops

import java.io.ByteArrayOutputStream

/** Minimal REAL WAV (RIFF/PCM) codec for the multimodal pipeline rows —
  * the audio sibling of [[PngCodec]]: byte-for-byte RIFF container
  * writing and chunk-walking parsing, implemented from the public WAVE
  * format spec (canonical 44-byte PCM layout), little-endian throughout.
  * Scope: 16-bit mono PCM — enough for the decode → feature-extract
  * plumbing the pipeline rows exercise; WavCodecSpec proves both
  * directions against the JDK's own javax.sound.sampled reader.
  */
object WavCodec {

  final case class Wav(sampleRate: Int, channels: Int, bitsPerSample: Int,
      samples: Array[Short])

  private def le16(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
  }
  private def le32(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
    o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff)
  }

  /** Encode 16-bit mono PCM into a canonical 44-byte-header WAV. */
  def encodePcm16Mono(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val o = new ByteArrayOutputStream(44 + samples.length * 2)
    val dataLen = samples.length * 2
    o.write("RIFF".getBytes("US-ASCII")); le32(o, 36 + dataLen)
    o.write("WAVE".getBytes("US-ASCII"))
    o.write("fmt ".getBytes("US-ASCII")); le32(o, 16)
    le16(o, 1)              // PCM
    le16(o, 1)              // mono
    le32(o, sampleRate)
    le32(o, sampleRate * 2) // byte rate = rate * block align
    le16(o, 2)              // block align
    le16(o, 16)             // bits per sample
    o.write("data".getBytes("US-ASCII")); le32(o, dataLen)
    samples.foreach(s => le16(o, s & 0xffff))
    o.toByteArray
  }

  private def rd16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def rd32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  /** Chunk-walking parse; validates magics and PCM-ness, tolerates
    * extra chunks between fmt and data (real-world WAVs carry LIST,
    * fact, etc.). Throws on malformed input — poison media should fail
    * loudly at the decode stage, not flow downstream as zeros.
    */
  def decode(bytes: Array[Byte]): Wav = {
    require(bytes.length >= 44, s"truncated WAV: ${bytes.length} bytes")
    require(tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE",
      "not a RIFF/WAVE container")
    var pos = 12
    var rate = -1; var channels = -1; var bits = -1
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length && (samples == null || rate < 0)) {
      val id = tag(bytes, pos)
      val len = rd32(bytes, pos + 4)
      id match {
        case "fmt " =>
          require(rd16(bytes, pos + 8) == 1, "not PCM")
          channels = rd16(bytes, pos + 10)
          rate = rd32(bytes, pos + 12)
          bits = rd16(bytes, pos + 22)
          require(bits == 16 && channels == 1,
            s"unsupported layout: $channels ch / $bits bit")
        case "data" =>
          val n = len / 2
          samples = Array.tabulate(n)(i =>
            rd16(bytes, pos + 8 + i * 2).toShort)
        case _ => () // skip auxiliary chunks
      }
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(rate > 0 && samples != null, "missing fmt or data chunk")
    Wav(rate, channels, bits, samples)
  }
}
