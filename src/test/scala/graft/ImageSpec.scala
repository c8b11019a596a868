package graft

import graft.model.Fixtures
import graft.operators.ImageOps
import org.apache.spark.sql.functions._

/** North-rule row invariants: decode-once, PSNR>=40dB, caption byte-equality. */
class ImageSpec extends SparkSuite {

  test("ppm and png encode/decode round-trip losslessly") {
    Seq("ppm", "png").foreach { fmt =>
      val pix = Fixtures.pixels(7L, 64, 96)
      val enc = Fixtures.encode(pix, 64, 96, fmt)
      val (w, h, dec) = Fixtures.decode(enc, fmt)
      assert(w == 64 && h == 96)
      assert(java.util.Arrays.equals(pix, dec), s"$fmt round trip must be exact")
      assert(ImageOps.psnr(pix, dec) == 99.0)
    }
  }

  test("decodeFeatures: every row decodes once with PSNR>=40 and caption preserved") {
    val images = Fixtures.images(spark, 300)
    val feats = ImageOps.decodeFeatures(images).toDF()
    val bad = feats.where(col("psnr_db") < 40.0 || !col("decoded_ok")).count()
    assert(bad == 0, s"$bad rows failed the PSNR/decode invariant")
    // caption byte-equality vs the source table
    val mismatch = feats.select(col("image_id"), col("caption").as("c2"))
      .join(images.select(col("image_id"), col("caption").as("c1")), "image_id")
      .where(col("c1") =!= col("c2")).count()
    assert(mismatch == 0)
    assert(feats.count() == 300)
  }

  test("resize produces expected dimensions deterministically") {
    val pix = Fixtures.pixels(3L, 64, 64)
    val r1 = ImageOps.resize(pix, 64, 64, 16, 16)
    val r2 = ImageOps.resize(pix, 64, 64, 16, 16)
    assert(r1.length == 16 * 16 * 3)
    assert(java.util.Arrays.equals(r1, r2))
  }

  test("images generator is deterministic (same seed, same bytes)") {
    val a = Fixtures.imageRow(42L)
    val b = Fixtures.imageRow(42L)
    assert(a.image_id == b.image_id && java.util.Arrays.equals(a.bytes, b.bytes))
    assert(a.phash == Fixtures.splitmix64(42L))
  }
}
