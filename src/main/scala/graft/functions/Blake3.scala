package graft.functions

/** BLAKE3 (O'Connor, Aumasson, Neves, Wilcox-O'Hearn — public spec),
  * 256-bit hex output: the reference's `blake3` scalar
  * (hash.rs; goldens hash.txt:81-109). Full chunk/tree mode: 1 KiB
  * chunks, binary tree over chunk chaining values (left subtree =
  * largest power-of-two of chunks), ROOT flag on the final
  * compression only. Validated in MoreAliases2Spec against the
  * reference's golden strings and the official test vectors
  * (empty, 1024 B and 1025 B repeating-251 inputs — the last two
  * exercise the multi-block and parent/tree paths).
  */
object Blake3 {
  private val IV = Array(
    0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
    0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19)
  private val PERM = Array(2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8)
  private val CHUNK_START = 1
  private val CHUNK_END = 2
  private val PARENT = 4
  private val ROOT = 8

  @inline private def rotr(x: Int, n: Int): Int = (x >>> n) | (x << (32 - n))

  private def g(s: Array[Int], a: Int, b: Int, c: Int, d: Int, mx: Int, my: Int): Unit = {
    s(a) = s(a) + s(b) + mx
    s(d) = rotr(s(d) ^ s(a), 16)
    s(c) = s(c) + s(d)
    s(b) = rotr(s(b) ^ s(c), 12)
    s(a) = s(a) + s(b) + my
    s(d) = rotr(s(d) ^ s(a), 8)
    s(c) = s(c) + s(d)
    s(b) = rotr(s(b) ^ s(c), 7)
  }

  /** one compression; returns the full 16-word state (cv' = words 0-7) */
  private def compress(cv: Array[Int], block: Array[Int], counter: Long,
      blockLen: Int, flags: Int): Array[Int] = {
    val s = new Array[Int](16)
    System.arraycopy(cv, 0, s, 0, 8)
    System.arraycopy(IV, 0, s, 8, 4)
    s(12) = counter.toInt
    s(13) = (counter >>> 32).toInt
    s(14) = blockLen
    s(15) = flags
    var m = block
    var r = 0
    while (r < 7) {
      g(s, 0, 4, 8, 12, m(0), m(1))
      g(s, 1, 5, 9, 13, m(2), m(3))
      g(s, 2, 6, 10, 14, m(4), m(5))
      g(s, 3, 7, 11, 15, m(6), m(7))
      g(s, 0, 5, 10, 15, m(8), m(9))
      g(s, 1, 6, 11, 12, m(10), m(11))
      g(s, 2, 7, 8, 13, m(12), m(13))
      g(s, 3, 4, 9, 14, m(14), m(15))
      r += 1
      if (r < 7) {
        val p = new Array[Int](16)
        var i = 0
        while (i < 16) { p(i) = m(PERM(i)); i += 1 }
        m = p
      }
    }
    var i = 0
    while (i < 8) { s(i) ^= s(i + 8); s(i + 8) ^= cv(i); i += 1 }
    s
  }

  private def words(data: Array[Byte], off: Int, len: Int): Array[Int] = {
    val m = new Array[Int](16)
    var i = 0
    while (i < len) {
      m(i >> 2) |= (data(off + i) & 0xff) << ((i & 3) << 3)
      i += 1
    }
    m
  }

  /** the deferred LAST compression of a subtree — finalized with ROOT
    * only at the top (mirrors the reference implementation's Output)
    */
  private final case class Out(cv: Array[Int], block: Array[Int], blockLen: Int,
      counter: Long, flags: Int) {
    def chain: Array[Int] = compress(cv, block, counter, blockLen, flags).take(8)
    def rootHex: String = {
      val st = compress(cv, block, counter, blockLen, flags | ROOT)
      val sb = new StringBuilder(64)
      var i = 0
      while (i < 8) {
        val w = st(i)
        var b = 0
        while (b < 4) { sb.append(f"${(w >>> (b << 3)) & 0xff}%02x"); b += 1 }
        i += 1
      }
      sb.toString
    }
  }

  private def chunkOut(data: Array[Byte], off: Int, len: Int, chunkIdx: Long): Out = {
    val nBlocks = math.max(1, (len + 63) / 64)
    var cv = IV
    var i = 0
    while (i < nBlocks - 1) {
      val flags = if (i == 0) CHUNK_START else 0
      cv = compress(cv, words(data, off + i * 64, 64), chunkIdx, 64, flags).take(8)
      i += 1
    }
    val lastLen = len - (nBlocks - 1) * 64
    val flags = (if (nBlocks == 1) CHUNK_START else 0) | CHUNK_END
    Out(cv, words(data, off + (nBlocks - 1) * 64, lastLen), lastLen, chunkIdx, flags)
  }

  private def subtree(data: Array[Byte], off: Int, len: Int, chunkIdx: Long): Out = {
    val nChunks = math.max(1, (len + 1023) / 1024)
    if (nChunks == 1) chunkOut(data, off, len, chunkIdx)
    else {
      // left = largest full power-of-two subtree strictly smaller
      val leftChunks = java.lang.Integer.highestOneBit(nChunks - 1)
      val leftLen = leftChunks * 1024
      val l = subtree(data, off, leftLen, chunkIdx).chain
      val r = subtree(data, off + leftLen, len - leftLen, chunkIdx + leftChunks).chain
      val block = new Array[Int](16)
      System.arraycopy(l, 0, block, 0, 8)
      System.arraycopy(r, 0, block, 8, 8)
      Out(IV, block, 64, 0L, PARENT)
    }
  }

  def hex(data: Array[Byte]): String = subtree(data, 0, data.length, 0L).rootHex
}
