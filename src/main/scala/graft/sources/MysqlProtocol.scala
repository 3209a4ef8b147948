package graft.sources

import java.io.{DataInputStream, OutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

/** The MySQL client/server protocol subset a replication client speaks —
  * the socket half of the reference's `BinLogStreamReader` connection
  * (`/root/reference/src/cdc_replicator.py:99-145`: host/port/user/passwd
  * settings, `server_id`, blocking dump), implemented from the PUBLIC
  * protocol documentation (MySQL Internals "Client/Server Protocol"):
  *
  *   - packet framing: 3-byte little-endian payload length + 1-byte
  *     sequence id, payload follows; messages of 16 MiB - 1 bytes and up
  *     travel as 0xffffff-length continuation packets spliced back
  *     transparently (a single row event carrying a large `LONGBLOB`
  *     legitimately crosses the boundary on a real primary);
  *   - initial handshake v10 (protocol version, server version,
  *     connection id, 20-byte auth scramble split 8 + 12, capability
  *     flags split low/high, auth plugin name);
  *   - HandshakeResponse41 (client flags, max packet, charset, 23
  *     reserved zeros, user, lenenc auth token, plugin name);
  *   - `mysql_native_password`: token = SHA1(pw) XOR
  *     SHA1(scramble ++ SHA1(SHA1(pw))) — the server stores only the
  *     DOUBLE hash (`mysql.user`-style) and verifies by recovering
  *     SHA1(pw) from the token, so the fixture server authenticates the
  *     documented way rather than comparing plaintext;
  *   - OK (0x00) / ERR (0xff) / EOF (0xfe, payload < 9 bytes) packets;
  *   - COM_REGISTER_SLAVE (0x15), COM_BINLOG_DUMP (0x12; the
  *     BINLOG_DUMP_NON_BLOCK flag makes the server answer EOF instead of
  *     blocking at log end) and COM_BINLOG_DUMP_GTID (0x1e; carries a
  *     [[GtidSet]] in its wire form so the primary skips transactions
  *     the replica already applied);
  *   - binlog event stream: each packet from the server is `0x00` + ONE
  *     binlog-file-format event (the file format IS the stream format —
  *     [[BinlogFormat.EventStreamDecoder]] consumes them unchanged).
  *
  * Pure bytes ↔ messages; the I/O loops live in [[BinlogSocketClient]]
  * and [[BinlogFixtureServer]].
  */
object MysqlProtocol {

  // capability flags (the subset a replication client needs)
  val ClientLongPassword = 0x1L
  val ClientProtocol41 = 0x200L
  val ClientSecureConnection = 0x8000L
  val ClientPluginAuth = 0x80000L
  val NativePasswordPlugin = "mysql_native_password"
  val CachingSha2Plugin = "caching_sha2_password" // the 8.0 default

  /** The flags our client sends and the fixture server requires. */
  val ClientCapabilities: Long =
    ClientLongPassword | ClientProtocol41 | ClientSecureConnection |
      ClientPluginAuth

  // command bytes
  val ComQuery = 0x03
  val ComRegisterSlave = 0x15
  val ComBinlogDump = 0x12
  val ComBinlogDumpGtid = 0x1e

  /** COM_BINLOG_DUMP flag: answer EOF at log end instead of blocking. */
  val BinlogDumpNonBlock = 0x01

  val MaxPacket = 0xffffff // 3-byte length; the continuation sentinel

  /** Spliced-message ceiling: MySQL's own max_allowed_packet maximum
    * (1 GiB) — nothing legal exceeds it, so the splice loop treats it
    * as a desync/abuse bound rather than buffering without limit. */
  val MaxMessage: Int = 1 << 30

  final case class Packet(seq: Int, payload: Array[Byte])

  /** Read one protocol MESSAGE, splicing the 16 MiB continuation form: a
    * packet whose length is exactly 0xffffff is followed by more packets
    * (sequence ids consecutive) whose payloads concatenate, until one
    * shorter than the sentinel — possibly EMPTY, when the message length
    * is an exact multiple — ends the message. A single row event
    * carrying a ~16 MB `LONGBLOB` value legitimately crosses this on a
    * real primary; `Packet.seq` is the LAST fragment's sequence id (the
    * one a reply continues from). */
  def readPacket(in: DataInputStream): Packet = {
    val h = new Array[Byte](4); in.readFully(h)
    var len = (h(0) & 0xff) | ((h(1) & 0xff) << 8) | ((h(2) & 0xff) << 16)
    var seq = h(3) & 0xff
    if (len < MaxPacket) {
      val p = new Array[Byte](len); in.readFully(p)
      Packet(seq, p)
    } else {
      val out = new java.io.ByteArrayOutputStream(MaxPacket * 2)
      var more = true
      while (more) {
        // bound the splice at the protocol's own ceiling — a desynced
        // or hostile stream whose bytes keep parsing as 0xffffff
        // headers must fail loudly, not accumulate to an OOM
        require(out.size() < MaxMessage,
          s"spliced message exceeds the ${MaxMessage >> 20} MiB " +
            "max_allowed_packet ceiling — stream desync or oversized event")
        val chunk = new Array[Byte](len); in.readFully(chunk)
        out.write(chunk)
        more = len == MaxPacket
        if (more) {
          val h2 = new Array[Byte](4); in.readFully(h2)
          len = (h2(0) & 0xff) | ((h2(1) & 0xff) << 8) | ((h2(2) & 0xff) << 16)
          val seq2 = h2(3) & 0xff
          require(seq2 == ((seq + 1) & 0xff),
            s"continuation packet out of sequence: $seq2 after $seq")
          seq = seq2
        }
      }
      Packet(seq, out.toByteArray)
    }
  }

  /** Write one protocol message, chunking payloads ≥ 16 MiB - 1 into the
    * continuation form (each full chunk is exactly 0xffffff bytes; the
    * terminator is the remainder, possibly a zero-length packet).
    * Returns the NEXT sequence id — a multi-fragment message consumes
    * several, and the conversation continues from the last one + 1. */
  def writePacket(out: OutputStream, seq: Int, payload: Array[Byte]): Int = {
    var off = 0
    var s = seq & 0xff
    def header(len: Int): Unit = out.write(Array(
      (len & 0xff).toByte, ((len >> 8) & 0xff).toByte,
      ((len >> 16) & 0xff).toByte, s.toByte))
    while (payload.length - off >= MaxPacket) {
      header(MaxPacket)
      out.write(payload, off, MaxPacket)
      off += MaxPacket
      s = (s + 1) & 0xff
    }
    header(payload.length - off)
    out.write(payload, off, payload.length - off)
    out.flush()
    (s + 1) & 0xff
  }

  // ---- mysql_native_password ----

  private def sha1(parts: Array[Byte]*): Array[Byte] = {
    val md = MessageDigest.getInstance("SHA-1")
    parts.foreach(md.update)
    md.digest()
  }

  private def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length, "xor length mismatch")
    Array.tabulate(a.length)(i => (a(i) ^ b(i)).toByte)
  }

  /** What `mysql.user` stores for the plugin: SHA1(SHA1(password)). */
  def doubleHash(password: String): Array[Byte] =
    sha1(sha1(password.getBytes(UTF_8)))

  /** Client-side token for the server's 20-byte scramble. */
  def nativePasswordToken(password: String, scramble: Array[Byte]): Array[Byte] = {
    require(scramble.length == 20, s"scramble must be 20 bytes, got ${scramble.length}")
    if (password.isEmpty) Array.empty
    else {
      val h1 = sha1(password.getBytes(UTF_8))
      xor(h1, sha1(scramble, sha1(h1)))
    }
  }

  /** Server-side check holding only the double hash: the token XOR
    * SHA1(scramble ++ stored) recovers SHA1(pw), whose SHA1 must equal
    * the stored value. */
  def verifyNativePassword(storedDoubleHash: Array[Byte],
                           scramble: Array[Byte],
                           token: Array[Byte]): Boolean =
    token.length == 20 && {
      val h1 = xor(token, sha1(scramble, storedDoubleHash))
      java.util.Arrays.equals(sha1(h1), storedDoubleHash)
    }

  // ---- caching_sha2_password (the 8.0 default) ----
  // Fast path only: the scramble exchange against the server's cache
  // entry. The full-auth fallback (AuthMoreData 0x04) requires TLS or
  // the server's RSA key and only fires on a cold cache — the fixture
  // primary always holds the entry, like a real primary after any prior
  // login; a cold-cache reply fails loudly rather than pretending.

  private def sha256(parts: Array[Byte]*): Array[Byte] = {
    val md = MessageDigest.getInstance("SHA-256")
    parts.foreach(md.update)
    md.digest()
  }

  /** The server's auth cache entry: SHA256(SHA256(password)). */
  def cachingSha2CacheEntry(password: String): Array[Byte] =
    sha256(sha256(password.getBytes(UTF_8)))

  /** Client token: SHA256(pw) XOR SHA256(SHA256(SHA256(pw)) ++ nonce) —
    * note the hash-of-hash comes FIRST in the concat, the reverse of
    * mysql_native_password's order. */
  def cachingSha2Token(password: String, nonce: Array[Byte]): Array[Byte] = {
    require(nonce.length == 20, s"nonce must be 20 bytes, got ${nonce.length}")
    if (password.isEmpty) Array.empty
    else {
      val h1 = sha256(password.getBytes(UTF_8))
      xor(h1, sha256(sha256(h1), nonce))
    }
  }

  /** Server-side fast-path check: token XOR SHA256(cache ++ nonce)
    * recovers SHA256(pw), whose SHA256 must equal the cache entry. */
  def verifyCachingSha2(cacheEntry: Array[Byte], nonce: Array[Byte],
                        token: Array[Byte]): Boolean =
    token.length == 32 && {
      val h1 = xor(token, sha256(cacheEntry, nonce))
      java.util.Arrays.equals(sha256(h1), cacheEntry)
    }

  /** The token for whichever plugin the server named. */
  def authToken(plugin: String, password: String,
                nonce: Array[Byte]): Array[Byte] = plugin match {
    case NativePasswordPlugin => nativePasswordToken(password, nonce)
    case CachingSha2Plugin    => cachingSha2Token(password, nonce)
    case p => throw new IllegalStateException(s"unsupported auth plugin $p")
  }

  // ---- caching_sha2 FULL auth (cold cache, no TLS): RSA exchange ----
  // The documented sequence a replica's FIRST-ever login after a primary
  // restart hits (the cache is empty until one successful auth): server
  // answers the scramble token with AuthMoreData 0x04 (perform full
  // authentication); the client sends a single 0x02 byte (public key
  // request); the server replies AuthMoreData carrying its RSA public
  // key in PEM; the client XORs (password ++ NUL) with the scramble
  // repeated and sends that encrypted RSA-OAEP(SHA-1) — the padding
  // MySQL's sha256/caching_sha2 plugins use with RSA_PKCS1_OAEP_PADDING.

  /** The client's public-key request inside full auth. */
  val PublicKeyRequest: Array[Byte] = Array[Byte](2)

  def isPublicKeyRequest(p: Array[Byte]): Boolean =
    p.length == 1 && p(0) == 2

  /** AuthMoreData carrying the server's RSA public key (PEM). */
  def publicKeyPacket(pem: String): Array[Byte] =
    1.toByte +: pem.getBytes(UTF_8)

  /** (password ++ NUL) XOR the scramble repeated — the obfuscation that
    * stops the server-side plaintext from being a replayable secret on
    * its own (the nonce is per-connection). */
  def xorPassword(password: String, nonce: Array[Byte]): Array[Byte] = {
    require(nonce.nonEmpty, "empty nonce")
    val pw = password.getBytes(UTF_8) :+ 0.toByte
    Array.tabulate(pw.length)(i => (pw(i) ^ nonce(i % nonce.length)).toByte)
  }

  /** X.509 SubjectPublicKeyInfo → the PEM form the server sends. */
  def pemPublicKey(pub: java.security.PublicKey): String =
    "-----BEGIN PUBLIC KEY-----\n" +
      java.util.Base64.getMimeEncoder(64, "\n".getBytes(UTF_8))
        .encodeToString(pub.getEncoded) +
      "\n-----END PUBLIC KEY-----\n"

  def parsePublicKeyPem(pem: String): java.security.PublicKey = {
    val b64 = pem.linesIterator
      .filterNot(l => l.isEmpty || l.startsWith("-----")).mkString
    java.security.KeyFactory.getInstance("RSA").generatePublic(
      new java.security.spec.X509EncodedKeySpec(
        java.util.Base64.getDecoder.decode(b64)))
  }

  private val RsaOaep = "RSA/ECB/OAEPWithSHA-1AndMGF1Padding"

  /** Client side: the full-auth password blob for the server's key. */
  def rsaEncryptPassword(password: String, nonce: Array[Byte],
                         publicKeyPem: String): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance(RsaOaep)
    c.init(javax.crypto.Cipher.ENCRYPT_MODE, parsePublicKeyPem(publicKeyPem))
    c.doFinal(xorPassword(password, nonce))
  }

  /** Server side: decrypt + un-XOR; the trailing NUL is stripped. */
  def rsaDecryptPassword(priv: java.security.PrivateKey, blob: Array[Byte],
                         nonce: Array[Byte]): String = {
    val c = javax.crypto.Cipher.getInstance(RsaOaep)
    c.init(javax.crypto.Cipher.DECRYPT_MODE, priv)
    val xored = c.doFinal(blob)
    val pw = Array.tabulate(xored.length)(i =>
      (xored(i) ^ nonce(i % nonce.length)).toByte)
    require(pw.nonEmpty && pw.last == 0, "full-auth blob lacks the NUL")
    new String(pw, 0, pw.length - 1, UTF_8)
  }

  // ---- auth continuation packets ----

  /** AuthSwitchRequest: 0xfe + plugin name NUL + new auth data. Shares
    * its lead byte with EOF; disambiguated by length (EOF < 9 bytes). */
  def authSwitchPacket(plugin: String, nonce: Array[Byte]): Array[Byte] = {
    val p = plugin.getBytes(UTF_8)
    val b = ByteBuffer.allocate(1 + p.length + 1 + nonce.length + 1)
    b.put(0xfe.toByte).put(p).put(0.toByte).put(nonce).put(0.toByte)
    b.array()
  }

  def isAuthSwitch(p: Array[Byte]): Boolean =
    p.length >= 9 && (p(0) & 0xff) == 0xfe

  /** (plugin name, auth data) of an AuthSwitchRequest; the trailing NUL
    * on the data is stripped. */
  def decodeAuthSwitch(payload: Array[Byte]): (String, Array[Byte]) = {
    val b = ByteBuffer.wrap(payload)
    b.get() // 0xfe
    val plugin = nulStr(b)
    val data = new Array[Byte](b.remaining()); b.get(data)
    (plugin, if (data.nonEmpty && data.last == 0) data.dropRight(1) else data)
  }

  /** AuthMoreData (0x01 lead): caching_sha2's fast-auth verdict. */
  def fastAuthSuccessPacket: Array[Byte] = Array[Byte](1, 3)
  def fullAuthRequiredPacket: Array[Byte] = Array[Byte](1, 4)
  def isAuthMoreData(p: Array[Byte]): Boolean =
    p.length == 2 && p(0) == 1
  def isFastAuthSuccess(p: Array[Byte]): Boolean =
    isAuthMoreData(p) && p(1) == 3

  // ---- handshake ----

  final case class Handshake(serverVersion: String, threadId: Long,
                             scramble: Array[Byte], capabilities: Long,
                             authPlugin: String)

  /** Initial Handshake v10. The 20-byte scramble travels split: 8 bytes
    * up front, 12 + NUL after the reserved block. */
  def encodeHandshake(h: Handshake): Array[Byte] = {
    require(h.scramble.length == 20, "scramble must be 20 bytes")
    val sv = h.serverVersion.getBytes(UTF_8)
    val plugin = h.authPlugin.getBytes(UTF_8)
    val b = ByteBuffer.allocate(1 + sv.length + 1 + 4 + 8 + 1 + 2 + 1 + 2 +
      2 + 1 + 10 + 13 + plugin.length + 1).order(ByteOrder.LITTLE_ENDIAN)
    b.put(10.toByte)
    b.put(sv).put(0.toByte)
    b.putInt(h.threadId.toInt)
    b.put(h.scramble, 0, 8).put(0.toByte) // part 1 + filler
    b.putShort((h.capabilities & 0xffff).toShort)
    b.put(0x21.toByte) // charset: utf8
    b.putShort(2.toShort) // status: autocommit
    b.putShort(((h.capabilities >> 16) & 0xffff).toShort)
    b.put(21.toByte) // auth data length incl. the trailing NUL
    b.put(new Array[Byte](10)) // reserved
    b.put(h.scramble, 8, 12).put(0.toByte) // part 2 + NUL
    b.put(plugin).put(0.toByte)
    b.array()
  }

  def decodeHandshake(payload: Array[Byte]): Handshake = {
    val b = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    val proto = b.get() & 0xff
    require(proto == 10, s"unsupported handshake protocol $proto")
    val serverVersion = nulStr(b)
    val threadId = b.getInt().toLong & 0xffffffffL
    val part1 = new Array[Byte](8); b.get(part1)
    b.get() // filler
    val capLow = (b.getShort().toLong & 0xffffL)
    b.get() // charset
    b.getShort() // status
    val capHigh = (b.getShort().toLong & 0xffffL) << 16
    val authLen = b.get() & 0xff
    skip(b, 10) // reserved
    val caps = capLow | capHigh
    require((caps & ClientSecureConnection) != 0,
      "server lacks CLIENT_SECURE_CONNECTION — pre-4.1 auth unsupported")
    // part 2: max(13, authLen - 8) bytes, of which 12 are scramble + NUL
    val part2Len = math.max(13, authLen - 8)
    val part2 = new Array[Byte](part2Len); b.get(part2)
    val plugin = if ((caps & ClientPluginAuth) != 0) nulStr(b)
                 else NativePasswordPlugin
    Handshake(serverVersion, threadId, part1 ++ part2.take(12), caps, plugin)
  }

  final case class HandshakeResponse(capabilities: Long, user: String,
                                     token: Array[Byte], authPlugin: String)

  /** HandshakeResponse41 (no database, no connect attrs — a replication
    * client registers against the server, not a schema). */
  def encodeHandshakeResponse(r: HandshakeResponse): Array[Byte] = {
    val user = r.user.getBytes(UTF_8)
    val plugin = r.authPlugin.getBytes(UTF_8)
    require(r.token.length < 251, "auth token too long for a 1-byte length")
    val b = ByteBuffer.allocate(4 + 4 + 1 + 23 + user.length + 1 +
      1 + r.token.length + plugin.length + 1).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(r.capabilities.toInt)
    b.putInt(MaxPacket)
    b.put(0x21.toByte) // charset: utf8
    b.put(new Array[Byte](23))
    b.put(user).put(0.toByte)
    b.put(r.token.length.toByte).put(r.token) // CLIENT_SECURE_CONNECTION form
    b.put(plugin).put(0.toByte)
    b.array()
  }

  def decodeHandshakeResponse(payload: Array[Byte]): HandshakeResponse = {
    val b = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    val caps = b.getInt().toLong & 0xffffffffL
    require((caps & ClientProtocol41) != 0, "client is not protocol 4.1")
    b.getInt() // max packet
    b.get() // charset
    skip(b, 23)
    val user = nulStr(b)
    val tokenLen = b.get() & 0xff
    require(tokenLen <= b.remaining(), s"auth token length $tokenLen overruns")
    val token = new Array[Byte](tokenLen); b.get(token)
    val plugin = if ((caps & ClientPluginAuth) != 0 && b.hasRemaining) nulStr(b)
                 else NativePasswordPlugin
    HandshakeResponse(caps, user, token, plugin)
  }

  // ---- result packets ----

  def okPacket: Array[Byte] =
    Array[Byte](0, 0, 0, 2, 0, 0, 0) // OK, 0 rows, 0 insert id, autocommit, 0 warnings

  def errPacket(code: Int, message: String): Array[Byte] = {
    val msg = message.getBytes(UTF_8)
    val b = ByteBuffer.allocate(1 + 2 + 1 + 5 + msg.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put(0xff.toByte).putShort(code.toShort)
    b.put('#'.toByte).put("HY000".getBytes(UTF_8))
    b.put(msg)
    b.array()
  }

  def eofPacket: Array[Byte] = Array[Byte](0xfe.toByte, 0, 0, 2, 0)

  def isOk(p: Array[Byte]): Boolean = p.nonEmpty && p(0) == 0
  def isErr(p: Array[Byte]): Boolean = p.nonEmpty && (p(0) & 0xff) == 0xff
  /** 0xfe marks EOF only on SHORT payloads — a binlog event whose first
    * byte happens to be 0xfe is longer (the documented disambiguation). */
  def isEof(p: Array[Byte]): Boolean =
    p.nonEmpty && (p(0) & 0xff) == 0xfe && p.length < 9

  def errMessage(p: Array[Byte]): String = {
    require(isErr(p), "not an ERR packet")
    val b = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
    b.get()
    val code = b.getShort() & 0xffff
    if (b.remaining() > 6 && p(3) == '#') skip(b, 6) // sql state marker
    val msg = new Array[Byte](b.remaining()); b.get(msg)
    s"MySQL error $code: ${new String(msg, UTF_8)}"
  }

  // ---- replication commands ----

  final case class RegisterSlave(serverId: Long, port: Int)

  def encodeRegisterSlave(r: RegisterSlave): Array[Byte] = {
    // hostname/user/password report as empty (like common client libs);
    // rank and master id are 0
    val b = ByteBuffer.allocate(1 + 4 + 1 + 1 + 1 + 2 + 4 + 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put(ComRegisterSlave.toByte)
    b.putInt(r.serverId.toInt)
    b.put(0.toByte).put(0.toByte).put(0.toByte) // empty host/user/password
    b.putShort(r.port.toShort)
    b.putInt(0) // replication rank
    b.putInt(0) // master id
    b.array()
  }

  def decodeRegisterSlave(p: Array[Byte]): RegisterSlave = {
    val b = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
    require((b.get() & 0xff) == ComRegisterSlave, "not COM_REGISTER_SLAVE")
    val serverId = b.getInt().toLong & 0xffffffffL
    val hostLen = b.get() & 0xff; skip(b, hostLen)
    val userLen = b.get() & 0xff; skip(b, userLen)
    val pwLen = b.get() & 0xff; skip(b, pwLen)
    val port = b.getShort() & 0xffff
    RegisterSlave(serverId, port)
  }

  final case class BinlogDump(pos: Long, flags: Int, serverId: Long,
                              file: String)

  def encodeBinlogDump(d: BinlogDump): Array[Byte] = {
    val f = d.file.getBytes(UTF_8)
    val b = ByteBuffer.allocate(1 + 4 + 2 + 4 + f.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put(ComBinlogDump.toByte)
    b.putInt(d.pos.toInt)
    b.putShort(d.flags.toShort)
    b.putInt(d.serverId.toInt)
    b.put(f)
    b.array()
  }

  def decodeBinlogDump(p: Array[Byte]): BinlogDump = {
    val b = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
    require((b.get() & 0xff) == ComBinlogDump, "not COM_BINLOG_DUMP")
    val pos = b.getInt().toLong & 0xffffffffL
    val flags = b.getShort() & 0xffff
    val serverId = b.getInt().toLong & 0xffffffffL
    val f = new Array[Byte](b.remaining()); b.get(f)
    BinlogDump(pos, flags, serverId, new String(f, UTF_8))
  }

  final case class BinlogDumpGtid(flags: Int, serverId: Long, file: String,
                                  pos: Long, gtids: GtidSet)

  def encodeBinlogDumpGtid(d: BinlogDumpGtid): Array[Byte] = {
    val f = d.file.getBytes(UTF_8)
    val g = d.gtids.wireBytes
    val b = ByteBuffer.allocate(1 + 2 + 4 + 4 + f.length + 8 + 4 + g.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put(ComBinlogDumpGtid.toByte)
    b.putShort(d.flags.toShort)
    b.putInt(d.serverId.toInt)
    b.putInt(f.length)
    b.put(f)
    b.putLong(d.pos)
    b.putInt(g.length)
    b.put(g)
    b.array()
  }

  def decodeBinlogDumpGtid(p: Array[Byte]): BinlogDumpGtid = {
    val b = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
    require((b.get() & 0xff) == ComBinlogDumpGtid, "not COM_BINLOG_DUMP_GTID")
    val flags = b.getShort() & 0xffff
    val serverId = b.getInt().toLong & 0xffffffffL
    val fLen = b.getInt()
    require(fLen >= 0 && fLen <= b.remaining(), s"file name length $fLen overruns")
    val f = new Array[Byte](fLen); b.get(f)
    val pos = b.getLong()
    val gLen = b.getInt()
    require(gLen >= 0 && gLen <= b.remaining(), s"gtid data length $gLen overruns")
    val g = new Array[Byte](gLen); b.get(g)
    BinlogDumpGtid(flags, serverId, new String(f, UTF_8), pos,
      GtidSet.fromWire(g))
  }

  // ---- text resultsets (COM_QUERY) ----
  // The classic EOF-terminated text protocol (CLIENT_DEPRECATE_EOF is
  // not negotiated): column-count packet, one column-definition packet
  // per column, EOF, one lenenc-string row packet per row (0xfb = NULL),
  // EOF. Enough for the session queries a replication client issues —
  // the reference's SHOW MASTER STATUS position discovery
  // (`src/cdc_replicator.py:84-96`).

  /** Column-definition packet (protocol 4.1 layout) for a VAR_STRING
    * column — the one shape SHOW-style resultsets need. */
  def columnDefPacket(name: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def lenencStr(v: String): Unit = {
      val b = v.getBytes(UTF_8)
      require(b.length < 251, s"lenenc string too long: $v")
      out.write(b.length); out.write(b, 0, b.length)
    }
    lenencStr("def"); lenencStr(""); lenencStr(""); lenencStr("")
    lenencStr(name); lenencStr(name)
    out.write(0x0c) // fixed-length fields length
    out.write(0x21); out.write(0) // charset utf8
    Seq(0, 1, 0, 0).foreach(out.write) // column length 256
    out.write(253) // type: VAR_STRING
    out.write(0); out.write(0) // flags
    out.write(0) // decimals
    out.write(0); out.write(0) // filler
    out.toByteArray
  }

  /** One text-protocol row: lenenc string per value, 0xfb for NULL. */
  def textRowPacket(values: Seq[String]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    values.foreach { v =>
      if (v == null) out.write(0xfb)
      else {
        val b = v.getBytes(UTF_8)
        require(b.length < 251, "fixture rows stay under the 1-byte lenenc")
        out.write(b.length); out.write(b, 0, b.length)
      }
    }
    out.toByteArray
  }

  /** Parse a text-protocol row against `nCols`. */
  def parseTextRow(payload: Array[Byte], nCols: Int): Seq[String] = {
    val b = ByteBuffer.wrap(payload)
    (0 until nCols).map { _ =>
      val first = b.get() & 0xff
      if (first == 0xfb) null
      else {
        val len = first match {
          case x if x < 0xfb => x
          case 0xfc => (b.get() & 0xff) | ((b.get() & 0xff) << 8)
          case x => throw new IllegalStateException(s"bad row length byte $x")
        }
        val a = new Array[Byte](len); b.get(a)
        new String(a, UTF_8)
      }
    }
  }

  // ---- primitives ----

  private def nulStr(b: ByteBuffer): String = {
    val start = b.position()
    while (b.get(b.position()) != 0) b.position(b.position() + 1)
    val a = new Array[Byte](b.position() - start)
    b.position(start); b.get(a); b.get() // NUL
    new String(a, UTF_8)
  }

  private def skip(b: ByteBuffer, n: Int): Unit = b.position(b.position() + n)
}
