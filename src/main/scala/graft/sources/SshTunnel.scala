package graft.sources

import java.net.{InetAddress, ServerSocket, Socket}
import java.util.concurrent.Executors

/**
 * SSH-tunnel seam (reference `db_components/db_common/ssh/ssh_utils.py`: the component
 * opens an SSH tunnel to the database and points the connector at the local forward).
 *
 * The zero-egress classpath carries no SSH client library, so the SSH TRANSPORT is the
 * pluggable part: a [[PortForward]] maps the database endpoint parsed from the JDBC url to
 * a `(localHost, localPort)` forward, and [[JdbcSnapshot.read]] connects there instead.
 * Everything around the missing library is real and tested:
 *  - [[SocketRelay]] is a working local-forward implementation (the listener half every
 *    tunnel needs) that pipes connections over a direct TCP socket; a deployment swaps the
 *    direct socket for an SSH channel from its client of choice;
 *  - [[SshKeys]] generates the keypair the reference registers with the bastion.
 */
trait PortForward extends AutoCloseable {
  /** Open (or reuse) a local forward to the remote endpoint. */
  def forward(remoteHost: String, remotePort: Int): (String, Int)
  override def close(): Unit = ()
}

/**
 * Plain TCP local forward: listens on an ephemeral loopback port and pipes each accepted
 * connection to the target endpoint, both directions, one pump thread per direction.
 * This is the transport-agnostic half of `ssh_utils.create_tunnel` — compose with an SSH
 * channel for the encrypted hop.
 */
final class SocketRelay extends PortForward {
  private val pool = Executors.newCachedThreadPool { r =>
    val t = new Thread(r, "socket-relay"); t.setDaemon(true); t
  }
  private val servers = new java.util.concurrent.ConcurrentLinkedQueue[ServerSocket]()
  @volatile private var closed = false

  override def forward(remoteHost: String, remotePort: Int): (String, Int) = {
    val server = new ServerSocket(0, 50, InetAddress.getLoopbackAddress)
    servers.add(server)
    pool.execute { () =>
      while (!closed && !server.isClosed) {
        try {
          val client = server.accept()
          val upstream = new Socket(remoteHost, remotePort)
          pool.execute(() => pump(client, upstream))
          pool.execute(() => pump(upstream, client))
        } catch { case _: Exception if closed || server.isClosed => () }
      }
    }
    (server.getInetAddress.getHostAddress, server.getLocalPort)
  }

  private def pump(from: Socket, to: Socket): Unit = {
    val buf = new Array[Byte](8192)
    try {
      val in = from.getInputStream
      val out = to.getOutputStream
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); out.flush(); n = in.read(buf) }
    } catch { case _: Exception => () }
    finally {
      try to.shutdownOutput() catch { case _: Exception => () }
    }
  }

  override def close(): Unit = {
    closed = true
    servers.forEach(s => try s.close() catch { case _: Exception => () })
    pool.shutdownNow()
    ()
  }
}
