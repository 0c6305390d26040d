package graft.pdf

import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** PDF standard security handler — from scratch per the public spec
  * (ISO 32000-1 §7.6.3 for R2–R4, ISO 32000-2 §7.6.4 for R6): RC4 is
  * implemented here, AES/MD5/SHA-2 come from the JDK's built-in
  * providers. Covers the four wire formats a web crawl actually hits:
  * RC4-40 (V1/R2), RC4-128 (V2/R3), AES-128-CBC (V4/R4/AESV2) and
  * AES-256-CBC (V5/R6/AESV3).
  *
  * Scope: empty-USER-password documents — the overwhelmingly dominant
  * encrypted population in a crawl ("owner-locked" PDFs that any viewer
  * opens silently; the reference's MuPDF path does exactly that). A
  * document whose user password is genuinely non-empty fails /U
  * validation and surfaces as the typed error `pdf_encrypted_password`
  * (X7 row, never a crash); as a bonus, R2–R4/R6 docs whose OWNER
  * password is empty are also recovered via the /O side.
  *
  * Reference: /root/reference/mvp/utils/pdf_processor.py (fitz.open)
  * hands PDFs to PyMuPDF which
  * transparently decrypts empty-user-password files; this reproduces
  * that capability on the JVM so such docs extract instead of erroring.
  */
object PdfCrypt {
  import PdfParser.PdfError

  /** The 32-byte padding string of Algorithm 2 (ISO 32000-1 7.6.3.3). */
  private val PAD: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  /** A resolved decryption context for one document. */
  final case class Session(
      fileKey: Array[Byte], v5: Boolean,
      stmAes: Boolean, strAes: Boolean,
      stmIdentity: Boolean, strIdentity: Boolean,
      encryptObjNum: Int, encryptMetadata: Boolean)

  // ------------------------------------------------------------ primitives

  private[graft] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = new Array[Int](256)
    var i = 0
    while (i < 256) { s(i) = i; i += 1 }
    var j = 0
    i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0; var y = 0; var k = 0
    while (k < data.length) {
      x = (x + 1) & 0xff
      y = (y + s(x)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      out(k) = (data(k) ^ s((s(x) + s(y)) & 0xff)).toByte
      k += 1
    }
    out
  }

  private def digest(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val md = MessageDigest.getInstance(alg)
    parts.foreach(md.update)
    md.digest()
  }
  private def md5(parts: Array[Byte]*): Array[Byte] = digest("MD5", parts: _*)

  private def aes(encrypt: Boolean, key: Array[Byte], iv: Option[Array[Byte]],
      data: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance(if (iv.isDefined) "AES/CBC/NoPadding" else "AES/ECB/NoPadding")
    val mode = if (encrypt) Cipher.ENCRYPT_MODE else Cipher.DECRYPT_MODE
    iv match {
      case Some(v) => c.init(mode, new SecretKeySpec(key, "AES"), new IvParameterSpec(v))
      case None    => c.init(mode, new SecretKeySpec(key, "AES"))
    }
    c.doFinal(data)
  }

  /** AES-CBC decrypt of the PDF wire form: 16-byte IV prefix, PKCS#5
    * padding (stripped leniently — an out-of-range pad byte keeps the
    * data, matching permissive readers). `lenient` (strings) returns
    * non-block-shaped data unchanged — real-world files occasionally
    * carry unencrypted strings where the spec says encrypted, and a
    * viewer shrugs; a malformed STREAM stays a typed error. */
  private def aesDecryptIvPrefix(key: Array[Byte], data: Array[Byte],
      lenient: Boolean): Array[Byte] = {
    if (data.length == 0) return data
    if (data.length < 32 || (data.length - 16) % 16 != 0) {
      if (lenient) return data
      throw PdfError("pdf_decrypt_bad_block")
    }
    val out = aes(encrypt = false, key, Some(java.util.Arrays.copyOfRange(data, 0, 16)),
      java.util.Arrays.copyOfRange(data, 16, data.length))
    val pad = out(out.length - 1) & 0xff
    if (pad >= 1 && pad <= 16 && pad <= out.length)
      java.util.Arrays.copyOfRange(out, 0, out.length - pad)
    else out
  }

  private def aesEncryptIvPrefix(key: Array[Byte], iv: Array[Byte],
      data: Array[Byte]): Array[Byte] = {
    val pad = 16 - data.length % 16
    val padded = new Array[Byte](data.length + pad)
    System.arraycopy(data, 0, padded, 0, data.length)
    java.util.Arrays.fill(padded, data.length, padded.length, pad.toByte)
    iv ++ aes(encrypt = true, key, Some(iv), padded)
  }

  /** ISO 32000-2 Algorithm 2.B — the R6 iterated hash. `udata` is the
    * 48-byte /U value when hashing the owner side, empty otherwise. The
    * AES input is always 64 concatenated repetitions, hence always a
    * multiple of 16 bytes — no padding is involved by construction. */
  private[graft] def hash2B(pwd: Array[Byte], salt: Array[Byte],
      udata: Array[Byte]): Array[Byte] = {
    var k = digest("SHA-256", pwd, salt, udata)
    var round = 0
    var e: Array[Byte] = null
    while (round < 64 || (e(e.length - 1) & 0xff) > round - 32) {
      val block = pwd ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      var i = 0
      while (i < 64) { System.arraycopy(block, 0, k1, i * block.length, block.length); i += 1 }
      e = aes(encrypt = true, java.util.Arrays.copyOfRange(k, 0, 16),
        Some(java.util.Arrays.copyOfRange(k, 16, 32)), k1)
      var sum = 0
      i = 0
      while (i < 16) { sum += e(i) & 0xff; i += 1 }
      k = (sum % 3) match {
        case 0 => digest("SHA-256", e)
        case 1 => digest("SHA-384", e)
        case _ => digest("SHA-512", e)
      }
      round += 1
    }
    java.util.Arrays.copyOfRange(k, 0, 32)
  }

  // --------------------------------------------------- key derivation (read)

  /** Algorithm 2: file key for R2–R4 from a padded password. */
  private def fileKeyR234(padded: Array[Byte], o: Array[Byte], p: Int, r: Int,
      n: Int, idFirst: Array[Byte], encryptMetadata: Boolean): Array[Byte] = {
    val pLe = Array[Byte](p.toByte, (p >> 8).toByte, (p >> 16).toByte, (p >> 24).toByte)
    val metaExt =
      if (r >= 4 && !encryptMetadata) Array[Byte](-1, -1, -1, -1) else Array.emptyByteArray
    var k = md5(padded, java.util.Arrays.copyOfRange(o, 0, math.min(32, o.length)),
      pLe, idFirst, metaExt)
    if (r >= 3) {
      var i = 0
      while (i < 50) { k = md5(java.util.Arrays.copyOfRange(k, 0, n)); i += 1 }
    }
    java.util.Arrays.copyOfRange(k, 0, n)
  }

  /** Algorithm 4/5's /U check value for a candidate file key. */
  private def uCheck(key: Array[Byte], r: Int, idFirst: Array[Byte]): Array[Byte] =
    if (r == 2) rc4(key, PAD)
    else {
      var x = rc4(key, md5(PAD, idFirst))
      var i = 1
      while (i <= 19) {
        x = rc4(key.map(b => (b ^ i).toByte), x)
        i += 1
      }
      x // 16 bytes; the stored /U appends 16 bytes of arbitrary padding
    }

  private def matches(a: Array[Byte], b: Array[Byte], n: Int): Boolean =
    a.length >= n && b.length >= n && {
      var i = 0
      while (i < n && a(i) == b(i)) i += 1
      i == n
    }

  /** Derive the file key with an empty password, R2–R4: try the user
    * side; if /U rejects, recover the user password from /O with an
    * empty OWNER password (Algorithm 7) and retry. */
  private def initR234(r: Int, length: Int, o: Array[Byte], u: Array[Byte], p: Int,
      idFirst: Array[Byte], encryptMetadata: Boolean): Array[Byte] = {
    val n = if (r == 2) 5 else math.max(5, math.min(16, length / 8))
    val direct = fileKeyR234(PAD, o, p, r, n, idFirst, encryptMetadata)
    if (matches(uCheck(direct, r, idFirst), u, if (r == 2) 32 else 16)) return direct
    // owner-empty recovery: the RC4 chain over /O yields the padded user pwd
    val okBase = {
      var k = md5(PAD)
      if (r >= 3) { var i = 0; while (i < 50) { k = md5(java.util.Arrays.copyOfRange(k, 0, n)); i += 1 } }
      java.util.Arrays.copyOfRange(k, 0, n)
    }
    val userPadded =
      if (r == 2) rc4(okBase, o)
      else {
        var x = o.clone()
        var i = 19
        while (i >= 0) {
          x = rc4(okBase.map(b => (b ^ i).toByte), x)
          i -= 1
        }
        x
      }
    val viaOwner = fileKeyR234(java.util.Arrays.copyOfRange(userPadded, 0, 32), o, p, r, n,
      idFirst, encryptMetadata)
    if (matches(uCheck(viaOwner, r, idFirst), u, if (r == 2) 32 else 16)) viaOwner
    else throw PdfError("pdf_encrypted_password")
  }

  /** Derive the file key with an empty password, R5 (legacy Adobe
    * SHA-256) / R6 (ISO 32000-2 2.B): validate against /U (user side)
    * or /O (owner side), then unwrap /UE (resp. /OE). */
  private def initR56(r: Int, o: Array[Byte], u: Array[Byte],
      oe: Array[Byte], ue: Array[Byte]): Array[Byte] = {
    if (u.length < 48) throw PdfError("pdf_bad_encrypt_dict")
    val empty = Array.emptyByteArray
    def h(salt: Array[Byte], udata: Array[Byte]): Array[Byte] =
      if (r == 5) digest("SHA-256", empty, salt, udata) else hash2B(empty, salt, udata)
    val uVal = java.util.Arrays.copyOfRange(u, 0, 32)
    val uVSalt = java.util.Arrays.copyOfRange(u, 32, 40)
    val uKSalt = java.util.Arrays.copyOfRange(u, 40, 48)
    if (matches(h(uVSalt, empty), uVal, 32)) {
      if (ue.length < 32) throw PdfError("pdf_bad_encrypt_dict")
      return aes(encrypt = false, h(uKSalt, empty), Some(new Array[Byte](16)),
        java.util.Arrays.copyOfRange(ue, 0, 32))
    }
    // owner side: udata is the full 48-byte /U
    if (o.length >= 48) {
      val u48 = java.util.Arrays.copyOfRange(u, 0, 48)
      val oVal = java.util.Arrays.copyOfRange(o, 0, 32)
      val oVSalt = java.util.Arrays.copyOfRange(o, 32, 40)
      val oKSalt = java.util.Arrays.copyOfRange(o, 40, 48)
      if (matches(h(oVSalt, u48), oVal, 32) && oe.length >= 32)
        return aes(encrypt = false, h(oKSalt, u48), Some(new Array[Byte](16)),
          java.util.Arrays.copyOfRange(oe, 0, 32))
    }
    throw PdfError("pdf_encrypted_password")
  }

  /** Bounded file-key cache: key derivation is deliberately expensive
    * (50 MD5 iterations for R3/R4, the 64+-round 2.B hash for R6 — a
    * password-cracking brake), but it is a pure function of the /Encrypt
    * fields + file ID, and crawl workloads re-derive it every time a
    * document (or a site's identically-keyed documents) is re-parsed.
    * 256 entries × ~200 bytes; synchronized LRU (access-order). */
  private val keyCache =
    new java.util.LinkedHashMap[String, Array[Byte]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Array[Byte]]): Boolean = size() > 256
    }

  /** Resolve a /Encrypt dictionary (fields pre-extracted by the parser)
    * into a [[Session]]. `cfmStm`/`cfmStr` are the /CFM names the StmF /
    * StrF crypt filters resolve to for V4/V5 ("" when absent → the V1/V2
    * RC4 default). */
  def init(v: Int, r: Int, length: Int, o: Array[Byte], u: Array[Byte],
      oe: Array[Byte], ue: Array[Byte], p: Int, encryptMetadata: Boolean,
      cfmStm: String, cfmStr: String, idFirst: Array[Byte],
      encryptObjNum: Int): Session = {
    def hx(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString
    val ck = s"$v:$r:$length:$p:$encryptMetadata:${hx(o)}:${hx(u)}:${hx(oe)}:${hx(ue)}:${hx(idFirst)}"
    val cached = keyCache.synchronized(keyCache.get(ck))
    val fileKey = if (cached != null) cached else (v, r) match {
      case (1, 2) => initR234(2, 40, o, u, p, idFirst, encryptMetadata)
      case (_, 3) => initR234(3, if (length > 0) length else 40, o, u, p, idFirst, encryptMetadata)
      case (_, 2) => initR234(2, if (length > 0) length else 40, o, u, p, idFirst, encryptMetadata)
      case (4, 4) => initR234(4, if (length > 0) length else 128, o, u, p, idFirst, encryptMetadata)
      case (5, 5) | (5, 6) => initR56(r, o, u, oe, ue)
      case _      => throw PdfError(s"pdf_encrypt_unsupported_v${v}r$r")
    }
    if (cached == null) keyCache.synchronized { keyCache.put(ck, fileKey); () }
    def aesOf(cfm: String): Boolean = cfm == "AESV2" || cfm == "AESV3"
    Session(fileKey, v5 = v == 5,
      stmAes = aesOf(cfmStm), strAes = aesOf(cfmStr),
      stmIdentity = cfmStm == "Identity", strIdentity = cfmStr == "Identity",
      encryptObjNum = encryptObjNum, encryptMetadata = encryptMetadata)
  }

  /** Per-object key, R2–R4 (Algorithm 1): MD5 over file key + low bytes
    * of (num, gen), plus the AES salt; first min(n+5, 16) bytes. */
  private def objectKey(fileKey: Array[Byte], num: Int, gen: Int, aesAlg: Boolean): Array[Byte] = {
    val ext = Array[Byte](num.toByte, (num >> 8).toByte, (num >> 16).toByte,
      gen.toByte, (gen >> 8).toByte)
    val salt = if (aesAlg) Array[Byte](0x73, 0x41, 0x6C, 0x54) else Array.emptyByteArray
    val k = md5(fileKey, ext, salt)
    java.util.Arrays.copyOfRange(k, 0, math.min(fileKey.length + 5, 16))
  }

  /** Decrypt one string or stream payload belonging to object (num, gen). */
  def decryptData(s: Session, num: Int, gen: Int, data: Array[Byte],
      isString: Boolean): Array[Byte] = {
    if (isString && s.strIdentity) return data
    if (!isString && s.stmIdentity) return data
    if (s.v5) return aesDecryptIvPrefix(s.fileKey, data, lenient = isString)
    val useAes = if (isString) s.strAes else s.stmAes
    val key = objectKey(s.fileKey, num, gen, useAes)
    if (useAes) aesDecryptIvPrefix(key, data, lenient = isString) else rc4(key, data)
  }

  // ------------------------------------------------------------ write side

  sealed trait Mode { def label: String }
  case object Rc4_40 extends Mode { val label = "rc4_40" }   // V1 R2
  case object Rc4_128 extends Mode { val label = "rc4_128" } // V2 R3
  case object Aes128 extends Mode { val label = "aes128" }   // V4 R4 AESV2
  case object Aes256 extends Mode { val label = "aes256" }   // V5 R6 AESV3

  final case class WriterSession(session: Session, dictBody: String, idHex: String,
      seed: Array[Byte]) {
    /** Encrypt one stream payload for object (num, gen); the AES IV is
      * derived deterministically from the seed + object id (the spec
      * requires unpredictability for confidentiality, not correctness —
      * these documents exist to test the read path). */
    def encrypt(num: Int, gen: Int, data: Array[Byte]): Array[Byte] = {
      val s = session
      if (s.v5)
        aesEncryptIvPrefix(s.fileKey, det(seed, s"iv:$num:$gen", 16), data)
      else if (s.stmAes)
        aesEncryptIvPrefix(objectKey(s.fileKey, num, gen, aesAlg = true),
          det(seed, s"iv:$num:$gen", 16), data)
      else rc4(objectKey(s.fileKey, num, gen, aesAlg = false), data)
    }
  }

  private def det(seed: Array[Byte], label: String, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var off = 0
    var ctr = 0
    while (off < n) {
      val d = digest("SHA-256", seed, label.getBytes("UTF-8"),
        Array[Byte](ctr.toByte))
      val take = math.min(32, n - off)
      System.arraycopy(d, 0, out, off, take)
      off += take; ctr += 1
    }
    out
  }

  private def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString

  /** [[forWriting]] is pure and deterministic in (mode, seed, objNum) —
    * same bounded-LRU treatment as [[keyCache]] for the derivation cost. */
  private val writerCache =
    new java.util.LinkedHashMap[String, WriterSession](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, WriterSession]): Boolean = size() > 256
    }

  /** Build an encryption context + /Encrypt dictionary body for the
    * writer, empty user AND owner passwords, deterministic from `seed`. */
  def forWriting(mode: Mode, seed: Array[Byte], encryptObjNum: Int): WriterSession = {
    val ck = mode.label + ":" + encryptObjNum + ":" +
      seed.map(x => f"${x & 0xff}%02x").mkString
    val hit = writerCache.synchronized(writerCache.get(ck))
    if (hit != null) return hit
    val built = buildForWriting(mode, seed, encryptObjNum)
    writerCache.synchronized { writerCache.put(ck, built); () }
    built
  }

  private def buildForWriting(mode: Mode, seed: Array[Byte],
      encryptObjNum: Int): WriterSession = {
    val idFirst = det(seed, "id", 16)
    val p = -3904 // print|copy denied — arbitrary but fixed; feeds key derivation
    mode match {
      case Rc4_40 | Rc4_128 | Aes128 =>
        val (v, r, bits) = mode match {
          case Rc4_40 => (1, 2, 40)
          case Rc4_128 => (2, 3, 128)
          case _ => (4, 4, 128)
        }
        val n = bits / 8
        // Algorithm 3: /O from the (empty) owner password
        val okBase = {
          var k = md5(PAD)
          if (r >= 3) { var i = 0; while (i < 50) { k = md5(java.util.Arrays.copyOfRange(k, 0, n)); i += 1 } }
          java.util.Arrays.copyOfRange(k, 0, n)
        }
        val o =
          if (r == 2) rc4(okBase, PAD)
          else {
            var x = PAD.clone()
            var i = 0
            while (i <= 19) { x = rc4(okBase.map(b => (b ^ i).toByte), x); i += 1 }
            x
          }
        val fileKey = fileKeyR234(PAD, o, p, r, n, idFirst, encryptMetadata = true)
        val u =
          if (r == 2) uCheck(fileKey, r, idFirst)
          else uCheck(fileKey, r, idFirst) ++ new Array[Byte](16)
        val cf =
          if (mode == Aes128)
            " /CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen /Length 16 >> >>" +
              " /StmF /StdCF /StrF /StdCF"
          else ""
        val dict = s"<< /Filter /Standard /V $v /R $r /Length $bits$cf" +
          s" /O <${hex(o)}> /U <${hex(u)}> /P $p >>"
        val aesm = mode == Aes128
        WriterSession(Session(fileKey, v5 = false, stmAes = aesm, strAes = aesm,
          stmIdentity = false, strIdentity = false, encryptObjNum, encryptMetadata = true),
          dict, hex(idFirst), seed)

      case Aes256 =>
        val fileKey = det(seed, "filekey", 32)
        val uV = det(seed, "uvsalt", 8); val uK = det(seed, "uksalt", 8)
        val oV = det(seed, "ovsalt", 8); val oK = det(seed, "oksalt", 8)
        val empty = Array.emptyByteArray
        val u = hash2B(empty, uV, empty) ++ uV ++ uK
        val ue = aes(encrypt = true, hash2B(empty, uK, empty),
          Some(new Array[Byte](16)), fileKey)
        val o = hash2B(empty, oV, u) ++ oV ++ oK
        val oe = aes(encrypt = true, hash2B(empty, oK, u),
          Some(new Array[Byte](16)), fileKey)
        val permsClear = Array[Byte](p.toByte, (p >> 8).toByte, (p >> 16).toByte,
          (p >> 24).toByte, -1, -1, -1, -1, 'T'.toByte, 'a'.toByte, 'd'.toByte,
          'b'.toByte) ++ det(seed, "perms", 4)
        val perms = aes(encrypt = true, fileKey, None, permsClear)
        val dict = "<< /Filter /Standard /V 5 /R 6 /Length 256" +
          " /CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >>" +
          " /StmF /StdCF /StrF /StdCF" +
          s" /O <${hex(o)}> /U <${hex(u)}> /OE <${hex(oe)}> /UE <${hex(ue)}>" +
          s" /P $p /Perms <${hex(perms)}> >>"
        WriterSession(Session(fileKey, v5 = true, stmAes = true, strAes = true,
          stmIdentity = false, strIdentity = false, encryptObjNum, encryptMetadata = true),
          dict, hex(idFirst), seed)
    }
  }
}
