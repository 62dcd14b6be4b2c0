package graft.evm

/** Keccak-256 (the pre-NIST padding variant used by Ethereum; reference
  * UDF `keccak256`, call site
  * examples/ethereum_token_erc20_balances/create_buffer.sql:20).
  * Plain-Scala Keccak-f[1600] sponge, rate 1088, pad 0x01…0x80.
  */
object Keccak256 {
  private val RC: Array[Long] = Array(
    0x0000000000000001L, 0x0000000000008082L, 0x800000000000808aL, 0x8000000080008000L,
    0x000000000000808bL, 0x0000000080000001L, 0x8000000080008081L, 0x8000000000008009L,
    0x000000000000008aL, 0x0000000000000088L, 0x0000000080008009L, 0x000000008000000aL,
    0x000000008000808bL, 0x800000000000008bL, 0x8000000000008089L, 0x8000000000008003L,
    0x8000000000008002L, 0x8000000000000080L, 0x000000000000800aL, 0x800000008000000aL,
    0x8000000080008081L, 0x8000000000008080L, 0x0000000080000001L, 0x8000000080008008L)

  // rotation offsets r[x][y], x = column, y = row
  private val R: Array[Array[Int]] = Array(
    Array(0, 36, 3, 41, 18),
    Array(1, 44, 10, 45, 2),
    Array(62, 6, 43, 15, 61),
    Array(28, 55, 25, 21, 56),
    Array(27, 20, 39, 8, 14))

  @inline private def rotl(x: Long, n: Int): Long =
    if (n == 0) x else (x << n) | (x >>> (64 - n))

  private val Rate = 136

  def hash(input: Array[Byte]): Array[Byte] = {
    val state = new Array[Long](25)
    val padLen = Rate - (input.length % Rate)
    val padded = java.util.Arrays.copyOf(input, input.length + padLen)
    padded(input.length) = 0x01.toByte
    padded(padded.length - 1) = (padded(padded.length - 1) | 0x80).toByte

    var off = 0
    while (off < padded.length) {
      var i = 0
      while (i < Rate / 8) {
        var lane = 0L
        var j = 7
        while (j >= 0) { lane = (lane << 8) | (padded(off + i * 8 + j) & 0xffL); j -= 1 }
        state(i) ^= lane
        i += 1
      }
      keccakF(state)
      off += Rate
    }

    val out = new Array[Byte](32)
    var i = 0
    while (i < 4) {
      val lane = state(i)
      var j = 0
      while (j < 8) { out(i * 8 + j) = ((lane >>> (8 * j)) & 0xff).toByte; j += 1 }
      i += 1
    }
    out
  }

  def hash(s: String): Array[Byte] = hash(s.getBytes("UTF-8"))

  def hashHex(s: String): String = Hex.encode(hash(s)).substring(2)

  private def keccakF(a: Array[Long]): Unit = {
    val c = new Array[Long](5)
    val b = new Array[Long](25)
    var round = 0
    while (round < 24) {
      // theta
      var x = 0
      while (x < 5) {
        c(x) = a(x) ^ a(x + 5) ^ a(x + 10) ^ a(x + 15) ^ a(x + 20); x += 1
      }
      x = 0
      while (x < 5) {
        val d = c((x + 4) % 5) ^ rotl(c((x + 1) % 5), 1)
        var y = 0
        while (y < 5) { a(x + 5 * y) ^= d; y += 1 }
        x += 1
      }
      // rho + pi
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          b(y + 5 * ((2 * x + 3 * y) % 5)) = rotl(a(x + 5 * y), R(x)(y))
          y += 1
        }
        x += 1
      }
      // chi
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          a(x + 5 * y) = b(x + 5 * y) ^ (~b(((x + 1) % 5) + 5 * y) & b(((x + 2) % 5) + 5 * y))
          y += 1
        }
        x += 1
      }
      // iota
      a(0) ^= RC(round)
      round += 1
    }
  }
}
