package graft

import java.io.ByteArrayInputStream
import javax.sound.sampled.AudioSystem

import graft.ops.WavCodec
import org.scalatest.funsuite.AnyFunSuite

/** WavCodec proven against the JDK's own javax.sound.sampled WAV
  * reader (the mm5/ImageIO technique): the encoder's bytes must parse
  * identically in an independent implementation, and the decoder must
  * round-trip them and walk real-world chunk layouts.
  */
class WavCodecSpec extends AnyFunSuite {

  private val samples = Array.tabulate(100)(i => ((i - 50) * 300).toShort)

  test("encoded WAV parses identically under the JDK's reader") {
    val bytes = WavCodec.encodePcm16Mono(8000, samples)
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    assert(fmt.getSampleRate == 8000f)
    assert(fmt.getChannels == 1)
    assert(fmt.getSampleSizeInBits == 16)
    assert(!fmt.isBigEndian)
    val raw = ais.readAllBytes()
    val jdk = Array.tabulate(raw.length / 2)(i =>
      ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort)
    assert(jdk.toSeq == samples.toSeq)
  }

  test("own decoder round-trips the encoder exactly") {
    val w = WavCodec.decode(WavCodec.encodePcm16Mono(44100, samples))
    assert(w.sampleRate == 44100)
    assert(w.channels == 1)
    assert(w.bitsPerSample == 16)
    assert(w.samples.toSeq == samples.toSeq)
  }

  test("decoder walks past auxiliary chunks (real-world WAVs carry " +
      "LIST/fact between fmt and data)") {
    val clean = WavCodec.encodePcm16Mono(8000, samples)
    // splice an 8-byte LIST chunk between fmt (ends at 36) and data
    val aux = Array[Byte]('L', 'I', 'S', 'T', 4, 0, 0, 0, 'I', 'N', 'F',
      'O')
    val spliced = clean.take(36) ++ aux ++ clean.drop(36)
    // patch the RIFF size field (bytes 4-7, little-endian)
    val total = spliced.length - 8
    spliced(4) = (total & 0xff).toByte
    spliced(5) = ((total >> 8) & 0xff).toByte
    spliced(6) = ((total >> 16) & 0xff).toByte
    spliced(7) = ((total >> 24) & 0xff).toByte
    val w = WavCodec.decode(spliced)
    assert(w.sampleRate == 8000 && w.samples.toSeq == samples.toSeq)
  }

  test("garbage fails loudly, not as silent zeros") {
    intercept[IllegalArgumentException] {
      WavCodec.decode(Array.fill[Byte](64)(0x41))
    }
    intercept[IllegalArgumentException] {
      WavCodec.decode("short".getBytes("US-ASCII"))
    }
  }
}
