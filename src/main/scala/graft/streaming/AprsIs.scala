package graft.streaming

/** APRS-IS application-level protocol: the login/filter handshake a live
  * APRS-IS connection requires before (or while) the server streams packets.
  *
  * Protocol (public APRS-IS spec): the server greets with a `#` comment
  * banner; the client sends ONE login line
  * `user CALL pass PASSCODE vers NAME VERSION [filter SPEC]` and the server
  * answers with a `# logresp CALL verified/unverified, server …` comment.
  * All subsequent `#` lines are keepalive comments; everything else is a
  * TNC2 packet line. The passcode is the public 15-bit alternating-byte XOR
  * hash of the uppercased base callsign.
  */
object AprsIs {

  /** APRS-IS passcode for a callsign — the public algorithm: start at
    * 0x73e2, XOR each even-indexed char of the uppercased, SSID-stripped
    * callsign into the high byte and each odd-indexed char into the low
    * byte, mask to 15 bits. (Spot values: N0CALL → 13023, TEST → 29939.) */
  def passcode(callsign: String): Int = {
    val base = callsign.toUpperCase.takeWhile(_ != '-')
    var hash = 0x73e2
    var i = 0
    while (i < base.length) {
      hash ^= base.charAt(i) << 8
      if (i + 1 < base.length) hash ^= base.charAt(i + 1)
      i += 2
    }
    hash & 0x7fff
  }

  /** The login line; `filter` is a server-side filter spec such as
    * `r/49.0/-72.0/100` (range), `p/N0` (prefix), `b/CALL` (budlist). */
  def loginLine(callsign: String, filter: Option[String]): String = {
    val base = s"user $callsign pass ${passcode(callsign)} vers graft 1.0"
    filter.fold(base)(f => s"$base filter $f")
  }
}

/** Client-side APRS-IS connection: connects to the server, performs the
  * [[AprsIs.loginLine]] handshake, records the banner and `# logresp`
  * acknowledgement, strips `#` comment/keepalive lines, and re-serves the
  * remaining packet lines on a loopback server socket for Spark's socket
  * source — the login protocol is connection-level, so it lives beside the
  * source rather than inside the (receive-only) socket source itself.
  *
  * Bounded relay state: packet lines queue up to `capacity` while the Spark
  * source attaches; overflow drops oldest-first semantics are NOT needed for
  * a broadcast radio feed — lines beyond capacity are counted in [[dropped]]
  * and discarded (the socket source is at-most-once already; the drop-dir
  * source is the durable deployment mode).
  */
final class AprsIsRelay(host: String, port: Int, callsign: String,
    filter: Option[String] = None, capacity: Int = 65536) {

  private val queue = new java.util.concurrent.LinkedBlockingQueue[String](capacity)
  private val local = new java.net.ServerSocket(0, 1,
    java.net.InetAddress.getByName("127.0.0.1"))
  @volatile private var closed = false
  @volatile var serverBanner: Option[String] = None
  @volatile var logresp: Option[String] = None
  // AtomicLong, not a @volatile var: the reader (offer failure) and the
  // writer (discarded carry-over on exit) both increment, and a volatile
  // read-modify-write can lose one of the two increments
  private val droppedCount = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Lines that can no longer reach any client. After close this INCLUDES
    * whatever is still sitting in the queue — counted at read time rather
    * than by a writer-side drain, because the reader may legally enqueue a
    * final line AFTER any drain loop finishes (it checks `closed` before
    * `offer`, not atomically with it); a drain would leave that line
    * forever uncounted, and dropped=0 would read as lossless delivery. */
  def dropped: Long =
    droppedCount.get() + (if (closed) queue.size().toLong else 0L)

  /** Terminal failure of the upstream APRS-IS connection, if any — a refused
    * or dropped connection used to vanish silently (the reader swallowed
    * every Throwable), leaving the stream empty with no diagnostic. Callers
    * (PacketCollector) surface this in their logs. */
  @volatile var readerError: Option[Throwable] = None

  /** Loopback port the Spark socket source should connect to. */
  def localPort: Int = local.getLocalPort

  // The live upstream socket, held so stop() can close it: a reader blocked
  // in readLine() on an idle APRS-IS connection (or sleeping in backoff)
  // would otherwise keep the TCP connection and thread alive indefinitely
  // after stop() (advisor r13).
  @volatile private var upstream: java.net.Socket = null

  // RECONNECT loop with capped exponential backoff: APRS-IS servers
  // routinely rotate/drop TCP connections after hours, and a reader that
  // exits on the first IOException silently halts ingestion forever while
  // the Spark query keeps completing empty batches (r13 review). Each
  // attempt's failure is surfaced through readerError (cleared on a
  // successful reconnect); the monitor prints it once a minute.
  private val reader = new Thread(() => {
    var backoffMs = 1000L
    while (!closed) {
      try {
        val sock = new java.net.Socket(host, port)
        upstream = sock
        try {
          // re-check AFTER publishing: a stop() that ran while the connect
          // was in flight saw upstream == null and closed nothing — without
          // this the fresh socket would block in readLine() until the
          // server's next keepalive, the exact leak stop() exists to
          // prevent (r14 diff review; the finally below closes the socket)
          if (closed)
            throw new java.io.IOException("relay stopped during connect")
          val in = new java.io.BufferedReader(new java.io.InputStreamReader(
            sock.getInputStream, java.nio.charset.StandardCharsets.UTF_8))
          val out = new java.io.PrintWriter(new java.io.OutputStreamWriter(
            sock.getOutputStream, java.nio.charset.StandardCharsets.UTF_8))
          // APRS-IS accepts the login at any point before data flows — send
          // it immediately; the banner comment arrives concurrently
          out.print(AprsIs.loginLine(callsign, filter) + "\r\n")
          out.flush()
          readerError = None
          backoffMs = 1000L // healthy connection resets the backoff
          var line = in.readLine()
          while (line != null && !closed) {
            if (line.startsWith("#")) {
              if (serverBanner.isEmpty) serverBanner = Some(line)
              if (logresp.isEmpty && line.toLowerCase.contains("logresp"))
                logresp = Some(line)
            } else if (!queue.offer(line)) droppedCount.incrementAndGet()
            line = in.readLine()
          }
        } finally {
          upstream = null
          try sock.close() catch { case _: Throwable => () }
        }
      } catch {
        case t: Throwable => if (!closed) readerError = Some(t)
      }
      if (!closed) { // EOF or error: back off, then redial (cap 60 s)
        try Thread.sleep(backoffMs) catch { case _: InterruptedException => () }
        backoffMs = math.min(backoffMs * 2, 60000L)
      }
    }
  }, "aprsis-reader")

  // Accept in a loop: Spark's socket source reconnects after a query restart,
  // and serving exactly one connection left the restarted stream silently
  // empty. Each accepted client is served until it disconnects or the relay
  // closes; a write failure (client went away) falls through to re-accept.
  // The line whose delivery FAILED is carried over and re-sent first to the
  // next accepted client — PrintWriter swallows the IOException into its
  // error flag, so without the carry-over the head-of-queue line at every
  // reconnect would vanish uncounted. (Delivery at the instant of
  // disconnect is inherently uncertain, so the carried line may reach the
  // next client as a duplicate: the relay is at-least-once across
  // reconnects, and the streaming queries dedup on content downstream.)
  private val writer = new Thread(() => {
    var pending: String = null
    while (!closed) {
      try {
        val cli = local.accept()
        try {
          val w = new java.io.PrintWriter(new java.io.OutputStreamWriter(
            cli.getOutputStream, java.nio.charset.StandardCharsets.UTF_8))
          var ok = !w.checkError()
          while (!closed && ok) {
            val l =
              if (pending != null) pending
              else queue.poll(100, java.util.concurrent.TimeUnit.MILLISECONDS)
            if (l != null) {
              w.println(l); w.flush()
              if (w.checkError()) { pending = l; ok = false }
              else pending = null
            }
          }
        } finally { try cli.close() catch { case _: Throwable => () } }
      } catch { case _: Throwable => () } // accept() fails only on close()
    }
    // Writer exit (relay closed): a line still held in `pending` was never
    // delivered to ANY client — count it (advisor r12: the monitor otherwise
    // reads a discarded carry-over line as delivered). Lines left IN THE
    // QUEUE are deliberately NOT drained here: the reader can still enqueue
    // after this point, so the residue is accounted at read time by the
    // `dropped` accessor instead.
    if (pending != null) { droppedCount.incrementAndGet(); pending = null }
  }, "aprsis-writer")

  def start(): AprsIsRelay = {
    reader.setDaemon(true); writer.setDaemon(true)
    reader.start(); writer.start()
    this
  }

  def stop(): Unit = {
    closed = true
    try local.close() catch { case _: Throwable => () }
    // Unblock a reader parked in readLine() (close its socket) or in the
    // backoff sleep (interrupt) so the thread exits promptly, not at the
    // next upstream keepalive.
    val up = upstream
    if (up != null) { try up.close() catch { case _: Throwable => () } }
    reader.interrupt()
  }
}
