// JVM-side image decode UDF: the PRODUCTION fast path for the image
// families (decode stays entirely in the executor JVM -- zero Python
// boundary, zero payload copies across Arrow). The pure-Python
// from-spec codecs (png_codec/jpeg_codec/gif_codec/bmp_codec) remain
// the correctness reference; pytest proves the two legs agree
// (bit-exact for the lossless containers, bounded-error for JPEG,
// whose IDCT is only spec-bounded, not bit-defined).
//
// Gray payloads are read via raster SAMPLES, not getRGB():
// BufferedImage.getRGB applies the gray to sRGB gamma ramp and would
// silently distort luma. Indexed/RGB images go through getRGB, whose
// palette lookup / channel reorder is exact.
import java.awt.image.BufferedImage;
import java.awt.image.IndexColorModel;
import java.awt.image.Raster;
import java.io.ByteArrayInputStream;
import javax.imageio.ImageIO;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.RowFactory;
import org.apache.spark.sql.api.java.UDF1;

public class JvmImageDecode implements UDF1<byte[], Row> {
  @Override
  public Row call(byte[] data) throws Exception {
    if (data == null) {
      return null;
    }
    BufferedImage img = ImageIO.read(new ByteArrayInputStream(data));
    if (img == null) {
      throw new IllegalArgumentException("javax.imageio cannot parse this payload");
    }
    int w = img.getWidth();
    int h = img.getHeight();
    Raster raster = img.getRaster();
    boolean gray =
        raster.getNumBands() == 1 && !(img.getColorModel() instanceof IndexColorModel);
    if (gray) {
      // 16-bit samples scale to 8 via the high byte, matching the
      // Python reference codec; a bare (byte) cast would keep the LOW
      // byte and silently diverge on every 16-bit gray payload.
      int bits = img.getColorModel().getComponentSize(0);
      int shift = bits > 8 ? bits - 8 : 0;
      int[] samples = raster.getSamples(0, 0, w, h, 0, (int[]) null);
      byte[] px = new byte[w * h];
      for (int i = 0; i < samples.length; i++) {
        px[i] = (byte) (samples[i] >> shift);
      }
      return RowFactory.create(w, h, 1, px);
    }
    int[] argb = img.getRGB(0, 0, w, h, null, 0, w);
    if (img.getColorModel().hasAlpha()) {
      // keep alpha: the Python reference leg returns 4-channel RGBA
      // for alpha payloads, and dropping a channel silently would
      // break the parity contract
      byte[] px = new byte[w * h * 4];
      for (int i = 0; i < argb.length; i++) {
        int v = argb[i];
        px[4 * i] = (byte) (v >> 16);
        px[4 * i + 1] = (byte) (v >> 8);
        px[4 * i + 2] = (byte) v;
        px[4 * i + 3] = (byte) (v >>> 24);
      }
      return RowFactory.create(w, h, 4, px);
    }
    byte[] px = new byte[w * h * 3];
    for (int i = 0; i < argb.length; i++) {
      int v = argb[i];
      px[3 * i] = (byte) (v >> 16);
      px[3 * i + 1] = (byte) (v >> 8);
      px[3 * i + 2] = (byte) v;
    }
    return RowFactory.create(w, h, 3, px);
  }
}
