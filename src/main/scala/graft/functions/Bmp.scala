package graft.functions

/** Pure-JVM codec for uncompressed 24-bit Windows bitmaps (BI_RGB) — the
  * real decoder behind the multimodal decode query, replacing the round-7
  * FakeDecoder stub. No external codec libraries: BMP's uncompressed form
  * is a fixed 54-byte header plus bottom-up BGR rows padded to 4-byte
  * boundaries, all little-endian, decodable with plain byte arithmetic.
  *
  * Layout reference (public format): BITMAPFILEHEADER (14 bytes: magic
  * "BM", file size, reserved, pixel-data offset) followed by
  * BITMAPINFOHEADER (40 bytes: header size, width, height, planes=1,
  * bpp=24, compression=0=BI_RGB, image size, resolutions, palette counts).
  * Pixel rows are stored bottom-up, each row w*3 BGR bytes padded with
  * zeros to a multiple of 4.
  *
  * [[decode24]] returns pixels in natural image order (row 0 = top) as an
  * RGB byte array — i.e. it really re-orders rows and swaps BGR→RGB, so a
  * round-trip through [[encode24]] is byte-exact on the pixel payload and
  * any header/padding corruption is detected, not smoothed over.
  */
object Bmp {

  private val FileHeaderSize = 14
  private val InfoHeaderSize = 40
  private val PixelOffset = FileHeaderSize + InfoHeaderSize

  /** Zero-padded bytes appended to each stored row: rows are w*3 BGR bytes
    * rounded up to a 4-byte boundary.
    */
  def rowPad(width: Int): Int = (4 - (width * 3) % 4) % 4

  /** Encode an RGB image (pixels in natural order, 3 bytes per pixel,
    * length must be w*h*3) as a complete 24-bit BI_RGB BMP file.
    */
  def encode24(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(rgb.length == width * height * 3,
      s"pixel buffer ${rgb.length} != ${width * height * 3}")
    val pad = rowPad(width)
    val rowBytes = width * 3 + pad
    val fileSize = PixelOffset + rowBytes * height
    val out = new Array[Byte](fileSize)
    def putLE32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def putLE16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putLE32(2, fileSize)
    putLE32(10, PixelOffset)
    putLE32(14, InfoHeaderSize)
    putLE32(18, width)
    putLE32(22, height) // positive = bottom-up, the canonical orientation
    putLE16(26, 1) // planes
    putLE16(28, 24) // bits per pixel
    putLE32(30, 0) // BI_RGB (uncompressed)
    putLE32(34, rowBytes * height)
    // resolutions + palette counts stay zero (valid for BI_RGB)
    var y = 0
    while (y < height) {
      val srcRow = y * width * 3
      val dstRow = PixelOffset + (height - 1 - y) * rowBytes
      var x = 0
      while (x < width) {
        // RGB (natural) -> BGR (stored)
        out(dstRow + x * 3) = rgb(srcRow + x * 3 + 2)
        out(dstRow + x * 3 + 1) = rgb(srcRow + x * 3 + 1)
        out(dstRow + x * 3 + 2) = rgb(srcRow + x * 3)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode a 24-bit BI_RGB BMP into (width, height, RGB pixels in natural
    * order). Fails fast (IllegalArgumentException) on anything that is not
    * an uncompressed 24-bit bottom-up BMP — wrong magic, unsupported bpp or
    * compression, truncated pixel data — rather than returning garbage.
    */
  def decode24(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bytes.length >= PixelOffset, s"truncated header: ${bytes.length}")
    require(bytes(0) == 'B' && bytes(1) == 'M', "bad magic")
    def le32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def le16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    val pixelOffset = le32(10)
    // an offset pointing inside the headers would make the pixel loop read
    // header bytes as BGR data — garbage with plausible dims; reject it
    // (fuzz finding: a corrupted offset byte used to surface as an
    // ArrayIndexOutOfBounds on negative values instead of a typed reject)
    require(pixelOffset >= PixelOffset, s"pixel offset $pixelOffset in header")
    val infoSize = le32(14)
    require(infoSize >= InfoHeaderSize, s"info header $infoSize")
    val width = le32(18)
    val height = le32(22)
    require(width > 0 && height > 0, s"unsupported dims ${width}x$height")
    require(le16(26) == 1, "planes != 1")
    require(le16(28) == 24, s"unsupported bpp ${le16(28)}")
    require(le32(30) == 0, s"unsupported compression ${le32(30)}")
    // size arithmetic in Long: a corrupted 4-byte width/height can pass the
    // positivity check yet overflow Int in rowBytes*height, flipping the
    // truncation require into a pass and the allocation below into a
    // NegativeArraySize/ArrayIndexOutOfBounds crash instead of a typed
    // reject (single-byte fuzz corruption of the high width/height bytes)
    val padL = (4 - (width.toLong * 3) % 4) % 4
    val rowBytesL = width.toLong * 3 + padL
    // EXACT length, not <=: this codec round-trips its own canonical form
    // (encode24 is the pipeline's only producer), where the pixel payload
    // fills the file. A mere lower bound lets a corrupted dim byte that
    // SHRINKS width/height decode "successfully" into a plausible smaller
    // image — silent data corruption in a dedup/fingerprint pipeline that
    // hashes decoded content (fuzz finding, round 10). Exactness turns
    // every dim-altering flip into a typed reject while the genuinely
    // ignored fields (file size, reserved, resolutions, palette/image
    // size) stay dims-preserving.
    require(pixelOffset.toLong + rowBytesL * height == bytes.length,
      s"pixel payload does not fill file: ${bytes.length}")
    // fits in Int: rowBytes*height <= bytes.length <= Int.MaxValue, and the
    // same bound covers width*height*3 (< rowBytes*height) and every row
    // offset computed in the loop
    val rowBytes = rowBytesL.toInt
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = pixelOffset + (height - 1 - y) * rowBytes
      val dstRow = y * width * 3
      var x = 0
      while (x < width) {
        rgb(dstRow + x * 3) = bytes(srcRow + x * 3 + 2)
        rgb(dstRow + x * 3 + 1) = bytes(srcRow + x * 3 + 1)
        rgb(dstRow + x * 3 + 2) = bytes(srcRow + x * 3)
        x += 1
      }
      y += 1
    }
    (width, height, rgb)
  }
}
