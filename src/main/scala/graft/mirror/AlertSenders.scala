package graft.mirror

import java.io.{BufferedReader, IOException, InputStreamReader}
import java.net.{HttpURLConnection, Socket, URL}
import java.nio.charset.StandardCharsets.UTF_8

/** Alert TRANSPORTS — the senders behind [[Alerting]]'s decision layer.
  * The reference fans fired alerts out to Slack
  * (`flow/alerting/slack_alert_sender.go`, blocks API via slack-go) and
  * email (`email_alert_sender.go`, SES SendEmail); here the same two
  * shapes run on raw JDK transports: a Slack *webhook* POST carrying
  * the identical block structure, and a from-scratch RFC 5321 SMTP
  * client (SES is an AWS-credentialed service — impossible offline —
  * but the mail itself is public protocol).
  *
  * Posture on failure matches the reference: a failed send is logged
  * and counted, never thrown into the monitoring loop that fired the
  * alert (alerting.go logs and moves on).
  */
object AlertSenders {

  /** The transport seam: deliver one (title, message). */
  trait AlertTransport {
    def send(title: String, message: String): Unit
  }

  /** Route fired alerts to their senders' transports. Transport errors
    * are swallowed per-alert (counted in the returned failure count) —
    * one dead webhook must not block the email path or the caller. */
  def dispatch(alerts: Seq[Alerting.Alert],
      transports: Map[Long, AlertTransport]): Int = {
    var failures = 0
    alerts.foreach { a =>
      transports.get(a.senderId).foreach { t =>
        try t.send(a.key, a.message)
        catch { case _: Exception => failures += 1 }
      }
    }
    failures
  }

  private def jsonEsc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** `formatCCMembers` parity (slack_alert_sender.go:47-59): no members
    * pings the channel, members render as `<@id>` mentions. */
  def ccMembers(members: Seq[String]): String =
    if (members.isEmpty) "cc: <!channel>"
    else "cc:" + members.map(m => s" <@$m>").mkString

  /** Slack sender over an incoming webhook: one POST per send with the
    * reference's exact block structure — a plain_text header block
    * `:rotating_light:Alert:rotating_light:: <title>` and an mrkdwn
    * section `<message>\n<cc line>` (slack_alert_sender.go:61-73). */
  final class SlackWebhookSender(webhookUrl: String,
      members: Seq[String] = Nil,
      connectTimeoutMs: Int = 5000, readTimeoutMs: Int = 10000)
      extends AlertTransport {
    override def send(title: String, message: String): Unit = {
      val header = s":rotating_light:Alert:rotating_light:: $title"
      val section = s"$message\n${ccMembers(members)}"
      val body =
        s"""{"blocks":[""" +
        s"""{"type":"header","text":{"type":"plain_text",""" +
        s""""text":"${jsonEsc(header)}","emoji":true}},""" +
        s"""{"type":"section","text":{"type":"mrkdwn",""" +
        s""""text":"${jsonEsc(section)}"}}]}"""
      val conn = new URL(webhookUrl).openConnection()
        .asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      val bytes = body.getBytes(UTF_8)
      conn.setFixedLengthStreamingMode(bytes.length)
      val out = conn.getOutputStream
      try { out.write(bytes); out.flush() } finally out.close()
      val code = conn.getResponseCode
      val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
      if (in != null) try in.readAllBytes() finally in.close()
      if (code / 100 != 2)
        throw new IOException(s"slack webhook answered $code")
    }
  }

  /** Plain-SMTP sender (RFC 5321 command layer + RFC 5322 headers):
    * EHLO → MAIL FROM → RCPT TO (each address) → DATA → QUIT. The
    * subject rides as a UTF-8 encoded-word so non-ASCII alert titles
    * survive any relay; the body is the alert message verbatim —
    * Subject/body/destination/Reply-To parity with the reference's
    * SES SendEmail fields (email_alert_sender.go:65-95). */
  final class SmtpEmailSender(host: String, port: Int,
      sourceEmail: String, emailAddresses: Seq[String],
      replyToAddresses: Seq[String] = Nil,
      connectTimeoutMs: Int = 5000, readTimeoutMs: Int = 15000)
      extends AlertTransport {
    require(emailAddresses.nonEmpty, "smtp: no destination addresses")

    override def send(title: String, message: String): Unit = {
      val sock = graft.cdc.Ssh.tcpDial(host, port, connectTimeoutMs)
      try {
        sock.setSoTimeout(readTimeoutMs)
        val in = new BufferedReader(
          new InputStreamReader(sock.getInputStream, UTF_8))
        val out = sock.getOutputStream
        def expect(codes: Int*): String = {
          // multi-line replies: "250-..." continues, "250 ..." ends
          var line = in.readLine()
          if (line == null) throw new IOException("smtp: connection closed")
          val first = line
          while (line != null && line.length >= 4 && line.charAt(3) == '-')
            line = in.readLine()
          val code = first.take(3).toInt
          if (!codes.contains(code))
            throw new IOException(s"smtp: expected ${codes.mkString("/")}, " +
              s"got '$first'")
          first
        }
        def cmd(s: String, codes: Int*): Unit = {
          out.write((s + "\r\n").getBytes(UTF_8))
          out.flush()
          expect(codes: _*)
        }
        expect(220)
        cmd("EHLO graft", 250)
        cmd(s"MAIL FROM:<$sourceEmail>", 250)
        emailAddresses.foreach(a => cmd(s"RCPT TO:<$a>", 250, 251))
        cmd("DATA", 354)
        val subject = "=?UTF-8?B?" + java.util.Base64.getEncoder
          .encodeToString(title.getBytes(UTF_8)) + "?="
        val headers = Seq(
          s"From: $sourceEmail",
          s"To: ${emailAddresses.mkString(", ")}") ++
          (if (replyToAddresses.nonEmpty)
            Seq(s"Reply-To: ${replyToAddresses.mkString(", ")}") else Nil) ++
          Seq(s"Subject: $subject",
            "MIME-Version: 1.0",
            "Content-Type: text/plain; charset=utf-8")
        // dot-stuffing (RFC 5321 §4.5.2): a body line starting with
        // '.' must double it or the relay ends DATA early
        val body = message.split("\n", -1).map { l =>
          if (l.startsWith(".")) "." + l else l
        }.mkString("\r\n")
        out.write((headers.mkString("\r\n") + "\r\n\r\n" + body +
          "\r\n.\r\n").getBytes(UTF_8))
        out.flush()
        expect(250)
        cmd("QUIT", 221)
      } finally {
        try sock.close() catch { case _: IOException => () }
      }
    }
  }
}
