package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal.Raster

/** GRAFT-RAW raster container: byte-level encode/decode round trip and
  * mean-pool resize (ragged edges, unsigned pixel handling). */
class RasterSpec extends AnyFunSuite {

  test("encode/decode round trip incl. multi-frame and unsigned pixels") {
    val w = 5; val h = 3
    val f0 = Array.tabulate(w * h)(i => (i * 17 % 256).toByte) // includes >127 values
    val f1 = Array.tabulate(w * h)(i => (255 - i).toByte)
    val payload = Raster.encode(w, h, Array(f0, f1))
    assert(payload.length == 8 + 2 * w * h)
    val dec = Raster.decode(payload).get
    assert(dec.width == w && dec.height == h && dec.nFrames == 2)
    assert(dec.frames(0).toSeq == f0.toSeq && dec.frames(1).toSeq == f1.toSeq)
    // corrupt magic / truncation -> None
    assert(Raster.decode(payload.updated(0, 'X'.toByte)).isEmpty)
    assert(Raster.decode(payload.dropRight(1)).isEmpty)
    assert(Raster.decode(Array[Byte]('G', 'R')).isEmpty)
  }

  test("meanPool: exact block means, ragged edges, unsigned arithmetic") {
    // 4x2 image, factor 2: blocks (2x2), (2x2)
    val frame = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80)
    val (ow, oh, pooled) = Raster.meanPool(frame, 4, 2, 2)
    assert(ow == 2 && oh == 1)
    assert(pooled.toSeq == Seq((10 + 20 + 50 + 60) / 4.0, (30 + 40 + 70 + 80) / 4.0))
    // ragged: 5x3 with factor 2 -> 3x2 output; last column/row blocks smaller
    val f2 = Array.tabulate(15)(i => i.toByte)
    val (ow2, oh2, p2) = Raster.meanPool(f2, 5, 3, 2)
    assert(ow2 == 3 && oh2 == 2)
    assert(p2(2) == (4 + 9) / 2.0) // rightmost block of first block-row: col 4, rows 0-1
    assert(p2(5) == 14.0) // bottom-right corner block: single pixel (row 2, col 4)
    // unsigned: pixel 0xFF pools as 255, not -1
    val (_, _, p3) = Raster.meanPool(Array(0xff.toByte), 1, 1, 4)
    assert(p3.toSeq == Seq(255.0))
  }
}
