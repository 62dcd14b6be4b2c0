package graft.evm

import scala.collection.mutable

/** ABI type model + full-signature parser + decoder/encoder, re-creating
  * the behavior of the reference's `evm_decode_event` / `evm_decode_call`
  * executable UDFs (call sites
  * examples/ethereum_decoded_logs/create_buffer.sql:26-31,
  * examples/ethereum_decoded_traces/create_buffer.sql:32-38;
  * fullsig grammar from the dictionary values, e.g.
  * "event Transfer(address indexed,address indexed,uint256)").
  *
  * Output contract (observed at the call sites): a JSON document
  * `{"value":{"signature":"Name(type,…)","inputs":{"arg0":…},
  * "outputs":{…}}}` on success, `{"error":"…"}` on failure; unsigned
  * integers rendered as bare decimal numbers (consumers cast
  * `…inputs.arg2::UInt256`), addresses/bytes as "0x…" strings.
  */
object Abi {

  sealed trait AbiType {
    def canonical: String
    def isDynamic: Boolean
    /** Head size in bytes when statically encoded. */
    def headSize: Int = 32
  }
  case class UIntType(bits: Int) extends AbiType {
    def canonical = s"uint$bits"; def isDynamic = false
  }
  case class IntType(bits: Int) extends AbiType {
    def canonical = s"int$bits"; def isDynamic = false
  }
  case object AddressType extends AbiType {
    def canonical = "address"; def isDynamic = false
  }
  case object BoolType extends AbiType {
    def canonical = "bool"; def isDynamic = false
  }
  case class FixedBytesType(n: Int) extends AbiType {
    def canonical = s"bytes$n"; def isDynamic = false
  }
  case object BytesType extends AbiType {
    def canonical = "bytes"; def isDynamic = true
  }
  case object StringType extends AbiType {
    def canonical = "string"; def isDynamic = true
  }
  case class ArrayType(elem: AbiType) extends AbiType {
    def canonical = s"${elem.canonical}[]"; def isDynamic = true
  }
  case class FixedArrayType(elem: AbiType, n: Int) extends AbiType {
    def canonical = s"${elem.canonical}[$n]"
    def isDynamic = elem.isDynamic
    override def headSize: Int = if (isDynamic) 32 else n * elem.headSize
  }
  case class TupleType(components: Seq[AbiType]) extends AbiType {
    def canonical = components.map(_.canonical).mkString("(", ",", ")")
    def isDynamic = components.exists(_.isDynamic)
    override def headSize: Int =
      if (isDynamic) 32 else components.map(_.headSize).sum
  }

  case class Param(tpe: AbiType, indexed: Boolean, name: Option[String])

  /** A parsed full signature: kind ∈ {event, function}. */
  case class FullSig(kind: String, name: String, inputs: Seq[Param], outputs: Seq[Param]) {
    /** Canonical signature "Name(type,…)" — keccak input. */
    def canonicalSignature: String =
      name + inputs.map(_.tpe.canonical).mkString("(", ",", ")")
    lazy val sigHash: Array[Byte] = Keccak256.hash(canonicalSignature)
    def selector: Array[Byte] = sigHash.take(4)
  }

  // ---------------------------------------------------------------- parser

  /** Parse "event Name(type [indexed] [name], …)" or
    * "function Name(types…)(returnTypes…)". */
  def parseFullSig(sig: String): FullSig = {
    val s = sig.trim
    val (kind, rest) =
      if (s.startsWith("event ")) ("event", s.substring(6).trim)
      else if (s.startsWith("function ")) ("function", s.substring(9).trim)
      else ("event", s) // bare "Name(…)" treated as event sig
    val open = rest.indexOf('(')
    require(open > 0, s"malformed signature: $sig")
    val name = rest.substring(0, open).trim
    val (inputsRaw, afterInputs) = readParen(rest, open)
    val outputsRaw =
      if (kind == "function" && afterInputs.trim.startsWith("("))
        readParen(afterInputs.trim, 0)._1
      else ""
    FullSig(kind, name, parseParams(inputsRaw), parseParams(outputsRaw))
  }

  /** Content of the paren group starting at `open`, plus the remainder. */
  private def readParen(s: String, open: Int): (String, String) = {
    var depth = 0
    var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return (s.substring(open + 1, i), s.substring(i + 1))
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced parens in: $s")
  }

  private def parseParams(raw: String): Seq[Param] = {
    val parts = splitTop(raw)
    parts.map { p =>
      val toks = p.trim.split("\\s+").filter(_.nonEmpty)
      require(toks.nonEmpty, s"empty parameter in: $raw")
      val tpe = parseType(toks(0))
      val indexed = toks.length > 1 && toks(1) == "indexed"
      val name = toks.drop(if (indexed) 2 else 1).headOption
      Param(tpe, indexed, name)
    }
  }

  /** Split on top-level commas (respecting parens/brackets). */
  private def splitTop(s: String): Seq[String] = {
    if (s.trim.isEmpty) return Nil
    val out = mutable.ArrayBuffer.empty[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case ',' if depth == 0 =>
          out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.toSeq
  }

  private val fixedArrayRe = """^(.*)\[(\d+)\]$""".r
  private val dynArrayRe = """^(.*)\[\]$""".r

  def parseType(t: String): AbiType = t match {
    case dynArrayRe(inner) => ArrayType(parseType(inner))
    case fixedArrayRe(inner, n) => FixedArrayType(parseType(inner), n.toInt)
    case "address" => AddressType
    case "bool" => BoolType
    case "bytes" => BytesType
    case "string" => StringType
    case "uint" => UIntType(256)
    case "int" => IntType(256)
    case _ if t.startsWith("uint") => UIntType(t.substring(4).toInt)
    case _ if t.startsWith("int") => IntType(t.substring(3).toInt)
    case _ if t.startsWith("bytes") => FixedBytesType(t.substring(5).toInt)
    case _ if t.startsWith("(") && t.endsWith(")") =>
      TupleType(splitTop(t.substring(1, t.length - 1)).map(x => parseType(x.trim)))
    case _ => throw new IllegalArgumentException(s"unsupported ABI type: $t")
  }

  // --------------------------------------------------------------- decoder

  sealed trait AbiValue
  case class NumV(v: BigInt) extends AbiValue
  case class BoolV(v: Boolean) extends AbiValue
  case class BytesV(v: Array[Byte]) extends AbiValue
  case class StrV(v: String) extends AbiValue
  case class ArrV(v: Seq[AbiValue]) extends AbiValue

  private def slot(data: Array[Byte], off: Int): Array[Byte] = {
    if (off + 32 > data.length)
      throw new IllegalArgumentException(s"out of data at offset $off (len ${data.length})")
    java.util.Arrays.copyOfRange(data, off, off + 32)
  }

  private def uintOf(bytes: Array[Byte]): BigInt = BigInt(1, bytes)

  /** Decode one value of type `tpe` whose head starts at `off`;
    * `base` is the start of the enclosing tuple's data area (dynamic
    * offsets are relative to it). */
  private def decodeValue(tpe: AbiType, data: Array[Byte], base: Int, off: Int): AbiValue =
    tpe match {
      case UIntType(_) => NumV(uintOf(slot(data, off)))
      case IntType(_) => NumV(BigInt(slot(data, off)))
      case AddressType => BytesV(slot(data, off).drop(12))
      case BoolType => BoolV(uintOf(slot(data, off)) != 0)
      case FixedBytesType(n) => BytesV(slot(data, off).take(n))
      case BytesType =>
        val p = base + uintOf(slot(data, off)).toInt
        val len = uintOf(slot(data, p)).toInt
        checkRange(data, p + 32, len)
        BytesV(java.util.Arrays.copyOfRange(data, p + 32, p + 32 + len))
      case StringType =>
        val p = base + uintOf(slot(data, off)).toInt
        val len = uintOf(slot(data, p)).toInt
        checkRange(data, p + 32, len)
        StrV(new String(data, p + 32, len, "UTF-8"))
      case ArrayType(elem) =>
        val p = base + uintOf(slot(data, off)).toInt
        val n = uintOf(slot(data, p)).toInt
        if (n > data.length) throw new IllegalArgumentException(s"array length $n exceeds data")
        ArrV(decodeSeq(Seq.fill(n)(elem), data, p + 32))
      case FixedArrayType(elem, n) =>
        if (tpe.isDynamic) {
          val p = base + uintOf(slot(data, off)).toInt
          ArrV(decodeSeq(Seq.fill(n)(elem), data, p))
        } else ArrV(decodeSeq(Seq.fill(n)(elem), data, off))
      case TupleType(comps) =>
        if (tpe.isDynamic) {
          val p = base + uintOf(slot(data, off)).toInt
          ArrV(decodeSeq(comps, data, p))
        } else ArrV(decodeSeq(comps, data, off))
    }

  private def checkRange(data: Array[Byte], start: Int, len: Int): Unit =
    if (len < 0 || start + len > data.length)
      throw new IllegalArgumentException(s"out of data: [$start, $start+$len) of ${data.length}")

  /** Decode a sequence of values laid out head-to-tail from `base`. */
  private def decodeSeq(types: Seq[AbiType], data: Array[Byte], base: Int): Seq[AbiValue] = {
    var off = base
    types.map { t =>
      val v = decodeValue(t, data, base, off)
      off += t.headSize
      v
    }
  }

  /** Decode a top-level tuple (call data body / event data section). */
  def decodeTuple(types: Seq[AbiType], data: Array[Byte]): Seq[AbiValue] =
    decodeSeq(types, data, 0)

  // --------------------------------------------------------------- encoder

  /** Encode a sequence of values as a top-level tuple (for eth_call data
    * and fixture generation). */
  def encodeTuple(types: Seq[AbiType], values: Seq[AbiValue]): Array[Byte] = {
    require(types.length == values.length, "arity mismatch")
    val heads = mutable.ArrayBuffer.empty[Either[Array[Byte], Int]] // Right = tail index
    val tails = mutable.ArrayBuffer.empty[Array[Byte]]
    types.zip(values).foreach { case (t, v) =>
      if (t.isDynamic) { heads += Right(tails.length); tails += encodeDynamic(t, v) }
      else heads += Left(encodeStatic(t, v))
    }
    val headSize = types.map(_.headSize).sum
    var tailOff = headSize
    val tailOffsets = tails.map { tl => val o = tailOff; tailOff += tl.length; o }
    val out = new mutable.ArrayBuilder.ofByte
    heads.zip(types).foreach {
      case (Left(b), _) => out ++= b
      case (Right(i), _) => out ++= pad32(BigInt(tailOffsets(i)).toByteArray)
    }
    tails.foreach(out ++= _)
    out.result()
  }

  private def pad32(b: Array[Byte]): Array[Byte] = {
    val src = if (b.length > 1 && b(0) == 0) b.dropWhile(_ == 0) else b
    require(src.length <= 32, "value exceeds 32 bytes")
    val out = new Array[Byte](32)
    System.arraycopy(src, 0, out, 32 - src.length, src.length)
    out
  }

  private def padRight32(b: Array[Byte]): Array[Byte] =
    java.util.Arrays.copyOf(b, ((b.length + 31) / 32) * 32)

  def encodeStatic(t: AbiType, v: AbiValue): Array[Byte] = (t, v) match {
    case (UIntType(_) | IntType(_), NumV(n)) =>
      if (n >= 0) pad32(n.toByteArray)
      else {
        val out = Array.fill[Byte](32)(0xff.toByte)
        val tw = n.toByteArray
        System.arraycopy(tw, 0, out, 32 - tw.length, tw.length)
        out
      }
    case (AddressType, BytesV(b)) => pad32(b)
    case (BoolType, BoolV(x)) => pad32(Array[Byte](if (x) 1 else 0))
    case (FixedBytesType(n), BytesV(b)) =>
      java.util.Arrays.copyOf(b, 32) // right-padded
    case (FixedArrayType(elem, n), ArrV(xs)) if !t.isDynamic =>
      xs.flatMap(x => encodeStatic(elem, x)).toArray
    case (TupleType(comps), ArrV(xs)) if !t.isDynamic =>
      comps.zip(xs).flatMap { case (c, x) => encodeStatic(c, x) }.toArray
    case _ => throw new IllegalArgumentException(s"cannot statically encode $t")
  }

  def encodeDynamic(t: AbiType, v: AbiValue): Array[Byte] = (t, v) match {
    case (BytesType, BytesV(b)) =>
      pad32(BigInt(b.length).toByteArray) ++ (if (b.isEmpty) Array.empty[Byte] else padRight32(b))
    case (StringType, StrV(s)) =>
      val b = s.getBytes("UTF-8")
      pad32(BigInt(b.length).toByteArray) ++ (if (b.isEmpty) Array.empty[Byte] else padRight32(b))
    case (ArrayType(elem), ArrV(xs)) =>
      pad32(BigInt(xs.length).toByteArray) ++ encodeTuple(Seq.fill(xs.length)(elem), xs)
    case (FixedArrayType(elem, n), ArrV(xs)) =>
      encodeTuple(Seq.fill(n)(elem), xs)
    case (TupleType(comps), ArrV(xs)) => encodeTuple(comps, xs)
    case _ => throw new IllegalArgumentException(s"cannot dynamically encode $t")
  }

  // ----------------------------------------------------------- JSON output

  def jsonEscape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Render a decoded value as JSON (numbers as bare decimals — the
    * consumer casts ::UInt256; bytes/addresses as "0x…" strings). */
  def valueToJson(v: AbiValue): String = v match {
    case NumV(n) => n.toString
    case BoolV(b) => b.toString
    case BytesV(b) => "\"" + Hex.encode(b) + "\""
    case StrV(s) => "\"" + jsonEscape(s) + "\""
    case ArrV(xs) => xs.map(valueToJson).mkString("[", ",", "]")
  }

  private def paramsJson(params: Seq[Param], values: Seq[AbiValue]): String =
    params.zipWithIndex.zip(values).map { case ((p, i), v) =>
      val key = p.name.getOrElse(s"arg$i")
      "\"" + jsonEscape(key) + "\":" + valueToJson(v)
    }.mkString("{", ",", "}")

  private def errorJson(msg: String): String =
    "{\"error\":\"" + jsonEscape(msg) + "\"}"

  // -------------------------------------------------------- event decoding

  /** Try candidate event fullsigs against (topics, data); first match
    * wins — mirrors the dictionary's one-selector-to-many-fullsigs shape
    * (examples/ethereum_decoded_logs/create_evm_abi_decoding_dictionary.sql:3). */
  def decodeEvent(topics: Seq[Array[Byte]], data: Array[Byte],
      fullsigs: Seq[String]): String = {
    if (topics == null || topics.isEmpty) return errorJson("no topics")
    if (fullsigs == null || fullsigs.isEmpty) return errorJson("no candidate signatures")
    val errors = mutable.ArrayBuffer.empty[String]
    fullsigs.foreach { raw =>
      try {
        val sig = parseFullSig(raw)
        if (!java.util.Arrays.equals(sig.sigHash, topics.head))
          errors += s"${sig.canonicalSignature}: topic0 mismatch"
        else {
          val indexed = sig.inputs.filter(_.indexed)
          val nonIndexed = sig.inputs.filterNot(_.indexed)
          if (indexed.length != topics.length - 1)
            errors += s"${sig.canonicalSignature}: expects ${indexed.length} indexed topics, got ${topics.length - 1}"
          else {
            // indexed dynamic params are keccak hashes — surface as bytes32
            val topicVals = indexed.zip(topics.tail).map { case (p, t) =>
              if (p.tpe.isDynamic) BytesV(t)
              else decodeValue(p.tpe, t, 0, 0)
            }
            val dataVals = decodeTuple(nonIndexed.map(_.tpe),
              if (data == null) Array.emptyByteArray else data)
            // re-interleave in declaration order
            var ti = 0
            var di = 0
            val all = sig.inputs.map { p =>
              if (p.indexed) { val v = topicVals(ti); ti += 1; v }
              else { val v = dataVals(di); di += 1; v }
            }
            return "{\"value\":{\"signature\":\"" +
              jsonEscape(sig.canonicalSignature) + "\",\"inputs\":" +
              paramsJson(sig.inputs, all) + "}}"
          }
        }
      } catch {
        case e: Exception => errors += s"$raw: ${e.getMessage}"
      }
    }
    errorJson(errors.mkString("; "))
  }

  // --------------------------------------------------------- call decoding

  /** Try candidate function fullsigs against (input, output). */
  def decodeCall(input: Array[Byte], output: Array[Byte],
      fullsigs: Seq[String]): String = {
    if (input == null || input.length < 4) return errorJson("input shorter than selector")
    if (fullsigs == null || fullsigs.isEmpty) return errorJson("no candidate signatures")
    val errors = mutable.ArrayBuffer.empty[String]
    fullsigs.foreach { raw =>
      try {
        val sig = parseFullSig(raw)
        if (!java.util.Arrays.equals(sig.selector, input.take(4)))
          errors += s"${sig.canonicalSignature}: selector mismatch"
        else {
          val in = decodeTuple(sig.inputs.map(_.tpe), input.drop(4))
          val out =
            if (output == null || output.isEmpty) Seq.empty[AbiValue]
            else decodeTuple(sig.outputs.map(_.tpe), output)
          val outputsJson =
            if (out.isEmpty) "{}" else paramsJson(sig.outputs, out)
          return "{\"value\":{\"signature\":\"" +
            jsonEscape(sig.canonicalSignature) + "\",\"inputs\":" +
            paramsJson(sig.inputs, in) + ",\"outputs\":" + outputsJson + "}}"
        }
      } catch {
        case e: Exception => errors += s"$raw: ${e.getMessage}"
      }
    }
    errorJson(errors.mkString("; "))
  }
}
