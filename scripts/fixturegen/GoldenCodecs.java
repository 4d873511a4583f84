// Golden-fixture generator for the in-engine image codecs.
//
// OpenJDK's ImageIO plugins are an INDEPENDENT standard implementation of
// JPEG (libjpeg-derived native decode, integer IDCT), GIF (real LZW with
// dictionary growth) and PNG (adaptive per-row filtering) — none of the
// repo's python codec code is involved, so fixtures produced here break
// any mirrored-convention bug an encode/decode round trip through our own
// codecs would hide (transposed IDCT basis, swapped zigzag, off-by-one LZW
// width bump, ...).
//
// Two jobs:
//   generate <outdir>         write deterministic images with ImageIO
//                             encoders + dump ImageIO-DECODED pixel
//                             arrays alongside (the external reference)
//   decode <outdir> <files..> decode files produced by OUR encoders with
//                             ImageIO and dump the pixel arrays (the
//                             reverse cross-attestation)
//
// Pixel dump formats (raw, row-major, u8):
//   *.gray  1 byte/px      *.rgb  3 bytes/px      *.rgba 4 bytes/px
//
// Determinism: all pixel content comes from an explicit 64-bit LCG
// (Numerical Recipes constants) — no java.util.Random, no clock.

import java.awt.image.BufferedImage;
import java.awt.image.IndexColorModel;
import java.awt.image.WritableRaster;
import java.io.File;
import java.io.FileOutputStream;
import java.util.Iterator;
import javax.imageio.IIOImage;
import javax.imageio.ImageIO;
import javax.imageio.ImageWriteParam;
import javax.imageio.ImageWriter;
import javax.imageio.stream.ImageOutputStream;

public final class GoldenCodecs {

    private static long lcg = 88172645463325252L;

    private static int rnd(int bound) {
        lcg = lcg * 6364136223846793005L + 1442695040888963407L;
        return (int) Long.remainderUnsigned(lcg >>> 16, bound);
    }

    public static void main(String[] args) throws Exception {
        if (args[0].equals("generate")) {
            generate(new File(args[1]));
        } else {
            File out = new File(args[1]);
            for (int i = 2; i < args.length; i++) {
                decodeAndDump(new File(args[i]), out);
            }
        }
    }

    // ---------------------------------------------------------------- gen

    private static void generate(File dir) throws Exception {
        dir.mkdirs();

        // --- JPEG: gray gradient, gray noise, RGB gradient, RGB odd-dims
        BufferedImage g1 = grayImage(16, 8, true);
        writeJpeg(g1, new File(dir, "java_gray_grad.jpg"), 0.95f);
        BufferedImage g2 = grayImage(24, 16, false);
        writeJpeg(g2, new File(dir, "java_gray_noise.jpg"), 1.0f);
        BufferedImage c1 = rgbImage(32, 24, true);
        writeJpeg(c1, new File(dir, "java_rgb_grad.jpg"), 0.9f);
        BufferedImage c2 = rgbImage(17, 11, true);
        writeJpeg(c2, new File(dir, "java_rgb_odd.jpg"), 1.0f);
        for (String n : new String[]{"java_gray_grad", "java_gray_noise",
                                     "java_rgb_grad", "java_rgb_odd"}) {
            decodeAndDump(new File(dir, n + ".jpg"), dir);
        }

        // --- GIF: real LZW streams with dictionary growth.  Structured
        // repetitive content drives deep dictionaries + code-width bumps;
        // the 256-color texture reaches wide codes.
        BufferedImage i1 = indexedImage(64, 48, 16);
        ImageIO.write(i1, "gif", new File(dir, "java_pal16.gif"));
        dumpIndexedAsRgba(i1, new File(dir, "java_pal16.rgba"));
        BufferedImage i2 = indexedImage(23, 17, 4);
        ImageIO.write(i2, "gif", new File(dir, "java_pal4.gif"));
        dumpIndexedAsRgba(i2, new File(dir, "java_pal4.rgba"));
        BufferedImage i3 = indexedImage(128, 96, 256);
        ImageIO.write(i3, "gif", new File(dir, "java_pal256.gif"));
        dumpIndexedAsRgba(i3, new File(dir, "java_pal256.rgba"));
        // sanity: ImageIO reads back its own GIFs losslessly
        for (String n : new String[]{"java_pal16", "java_pal4",
                                     "java_pal256"}) {
            BufferedImage back = ImageIO.read(new File(dir, n + ".gif"));
            BufferedImage orig = n.equals("java_pal16") ? i1
                    : n.equals("java_pal4") ? i2 : i3;
            for (int y = 0; y < orig.getHeight(); y++) {
                for (int x = 0; x < orig.getWidth(); x++) {
                    if (back.getRGB(x, y) != orig.getRGB(x, y)) {
                        throw new IllegalStateException(
                                "GIF round-trip mismatch in " + n);
                    }
                }
            }
        }

        // --- PNG: ImageIO's writer picks per-row adaptive filters —
        // an external stream for our unfilter paths.
        BufferedImage p1 = rgbImage(31, 19, false);
        ImageIO.write(p1, "png", new File(dir, "java_rgb.png"));
        dumpRgb(p1, new File(dir, "java_rgb.rgb"));
        BufferedImage p2 = grayImage(16, 16, false);
        ImageIO.write(p2, "png", new File(dir, "java_gray.png"));
        dumpGray(p2, new File(dir, "java_gray.gray"));
        BufferedImage p3 = rgbaImage(21, 13);
        ImageIO.write(p3, "png", new File(dir, "java_rgba.png"));
        dumpRgba(p3, new File(dir, "java_rgba.rgba"));
    }

    private static BufferedImage grayImage(int w, int h, boolean grad) {
        BufferedImage img = new BufferedImage(w, h,
                BufferedImage.TYPE_BYTE_GRAY);
        WritableRaster r = img.getRaster();
        for (int y = 0; y < h; y++) {
            for (int x = 0; x < w; x++) {
                int v = grad ? (x * 13 + y * 7) % 256 : rnd(256);
                r.setSample(x, y, 0, v);
            }
        }
        return img;
    }

    private static BufferedImage rgbImage(int w, int h, boolean grad) {
        BufferedImage img = new BufferedImage(w, h,
                BufferedImage.TYPE_3BYTE_BGR);
        for (int y = 0; y < h; y++) {
            for (int x = 0; x < w; x++) {
                int rr, gg, bb;
                if (grad) {
                    rr = (x * 8) % 256;
                    gg = (y * 8) % 256;
                    bb = ((x + y) * 4) % 256;
                } else {
                    rr = rnd(256);
                    gg = rnd(256);
                    bb = rnd(256);
                }
                img.setRGB(x, y, (rr << 16) | (gg << 8) | bb);
            }
        }
        return img;
    }

    private static BufferedImage rgbaImage(int w, int h) {
        BufferedImage img = new BufferedImage(w, h,
                BufferedImage.TYPE_INT_ARGB);
        for (int y = 0; y < h; y++) {
            for (int x = 0; x < w; x++) {
                int a = (x + y) % 3 == 0 ? rnd(256) : 255;
                img.setRGB(x, y, (a << 24) | (rnd(256) << 16)
                        | (rnd(256) << 8) | rnd(256));
            }
        }
        return img;
    }

    private static BufferedImage indexedImage(int w, int h, int ncolors) {
        byte[] r = new byte[ncolors];
        byte[] g = new byte[ncolors];
        byte[] b = new byte[ncolors];
        for (int i = 0; i < ncolors; i++) {
            r[i] = (byte) ((i * 37) % 256);
            g[i] = (byte) ((i * 73 + 11) % 256);
            b[i] = (byte) ((i * 151 + 5) % 256);
        }
        int bits = ncolors <= 2 ? 1 : ncolors <= 4 ? 2
                : ncolors <= 16 ? 4 : 8;
        IndexColorModel cm = new IndexColorModel(bits, ncolors, r, g, b);
        BufferedImage img = new BufferedImage(w, h,
                BufferedImage.TYPE_BYTE_INDEXED, cm);
        WritableRaster ra = img.getRaster();
        for (int y = 0; y < h; y++) {
            for (int x = 0; x < w; x++) {
                // repetitive texture: horizontal runs + diagonal stripes
                // (LZW-friendly => deep dictionary), plus noise patches
                int v = (x / 7 + y / 5) % 2 == 0
                        ? (x + 2 * y) % ncolors
                        : rnd(ncolors);
                ra.setSample(x, y, 0, v);
            }
        }
        return img;
    }

    private static void writeJpeg(BufferedImage img, File f, float q)
            throws Exception {
        Iterator<ImageWriter> it = ImageIO.getImageWritersByFormatName("jpeg");
        ImageWriter w = it.next();
        ImageWriteParam p = w.getDefaultWriteParam();
        p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
        p.setCompressionQuality(q);
        try (ImageOutputStream os = ImageIO.createImageOutputStream(f)) {
            w.setOutput(os);
            w.write(null, new IIOImage(img, null, null), p);
        }
        w.dispose();
    }

    // ------------------------------------------------------------- decode

    private static void decodeAndDump(File f, File dir) throws Exception {
        BufferedImage img = ImageIO.read(f);
        if (img == null) {
            throw new IllegalStateException("ImageIO failed on " + f);
        }
        String base = f.getName().replaceFirst("[.][^.]+$", "");
        boolean isGif = f.getName().endsWith(".gif");
        if (img.getRaster().getNumBands() == 1
                && img.getType() == BufferedImage.TYPE_BYTE_GRAY) {
            dumpGray(img, new File(dir, base + ".gray"));
        } else if (isGif || img.getColorModel().hasAlpha()) {
            dumpRgba(img, new File(dir, base + ".rgba"));
        } else {
            dumpRgb(img, new File(dir, base + ".rgb"));
        }
    }

    private static void dumpGray(BufferedImage img, File f) throws Exception {
        int w = img.getWidth(), h = img.getHeight();
        byte[] out = new byte[w * h];
        WritableRaster r = img.getRaster();
        for (int y = 0; y < h; y++) {
            for (int x = 0; x < w; x++) {
                out[y * w + x] = (byte) r.getSample(x, y, 0);
            }
        }
        write(f, out);
    }

    private static void dumpRgb(BufferedImage img, File f) throws Exception {
        int w = img.getWidth(), h = img.getHeight();
        byte[] out = new byte[w * h * 3];
        for (int y = 0; y < h; y++) {
            for (int x = 0; x < w; x++) {
                int p = img.getRGB(x, y);
                int i = (y * w + x) * 3;
                out[i] = (byte) (p >> 16);
                out[i + 1] = (byte) (p >> 8);
                out[i + 2] = (byte) p;
            }
        }
        write(f, out);
    }

    private static void dumpRgba(BufferedImage img, File f) throws Exception {
        int w = img.getWidth(), h = img.getHeight();
        byte[] out = new byte[w * h * 4];
        for (int y = 0; y < h; y++) {
            for (int x = 0; x < w; x++) {
                int p = img.getRGB(x, y);
                int i = (y * w + x) * 4;
                out[i] = (byte) (p >> 16);
                out[i + 1] = (byte) (p >> 8);
                out[i + 2] = (byte) p;
                out[i + 3] = (byte) (p >>> 24);
            }
        }
        write(f, out);
    }

    // GIF sources: dump the ORIGINAL (pre-encode) pixels — GIF is
    // lossless, so these are the decode expectation.
    private static void dumpIndexedAsRgba(BufferedImage img, File f)
            throws Exception {
        dumpRgba(img, f);
    }

    private static void write(File f, byte[] data) throws Exception {
        try (FileOutputStream os = new FileOutputStream(f)) {
            os.write(data);
        }
    }
}
