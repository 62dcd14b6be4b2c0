package graft.evm

/** EVM hex codec — behavior of the reference's executable UDFs
  * `evm_hex_decode` / `evm_hex_decode_int` / `evm_hex_encode` /
  * `evm_hex_encode_int` (call sites e.g.
  * examples/ethereum_blocks/create_buffer.sql:14-36; JSON-RPC quantity
  * form per the Ethereum JSON-RPC spec: minimal hex, "0x0" for zero).
  */
object Hex {
  private val digits = "0123456789abcdef".toCharArray

  private def stripPrefix(s: String): String =
    if (s.length >= 2 && s.charAt(0) == '0' && (s.charAt(1) == 'x' || s.charAt(1) == 'X'))
      s.substring(2)
    else s

  /** "0x…" (or bare) hex → bytes; odd-length input is left-padded.
    * Invalid characters throw (the reference UDF errors on bad hex —
    * silently producing garbage bytes would corrupt addresses/hashes
    * undetected downstream). */
  def decode(s: String): Array[Byte] = {
    val h0 = stripPrefix(s)
    val h = if (h0.length % 2 == 1) "0" + h0 else h0
    val out = new Array[Byte](h.length / 2)
    var i = 0
    while (i < out.length) {
      val hi = Character.digit(h.charAt(2 * i), 16)
      val lo = Character.digit(h.charAt(2 * i + 1), 16)
      if (hi < 0 || lo < 0)
        throw new IllegalArgumentException(s"invalid hex input: $s")
      out(i) = ((hi << 4) | lo).toByte
      i += 1
    }
    out
  }

  /** "0x…" quantity → unsigned BigInt (empty/“0x” → 0). */
  def decodeQuantity(s: String): BigInt = {
    val h = stripPrefix(s)
    if (h.isEmpty) BigInt(0) else BigInt(h, 16)
  }

  /** "0x…" quantity → Long (throws if it exceeds Long range). */
  def decodeLong(s: String): Long = {
    val q = decodeQuantity(s)
    if (!q.isValidLong) throw new ArithmeticException(s"quantity $s exceeds Int64")
    q.toLong
  }

  /** bytes → "0x…" lowercase (empty → "0x"). */
  def encode(b: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(2 + 2 * b.length)
    sb.append("0x")
    var i = 0
    while (i < b.length) {
      sb.append(digits((b(i) >> 4) & 0xf)).append(digits(b(i) & 0xf))
      i += 1
    }
    sb.toString
  }

  /** Non-negative integer → minimal "0x…" quantity ("0x1b4", never "0x01b4"). */
  def encodeQuantity(n: BigInt): String = {
    require(n >= 0, s"negative quantity $n")
    "0x" + n.toString(16)
  }

  def encodeQuantity(n: Long): String = {
    require(n >= 0, s"negative quantity $n")
    "0x" + java.lang.Long.toHexString(n)
  }
}
