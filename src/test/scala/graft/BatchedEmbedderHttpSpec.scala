package graft

import graft.embed.BatchedEmbedder
import org.scalatest.funsuite.AnyFunSuite

/** Integration probe for the external-embedder transport seam: a flaky
  * IN-PROCESS HTTP stub (JDK HttpServer on loopback — no network)
  * behind [[BatchedEmbedder]], pinning the reference connector contract
  * (vector-client.ts:332-351): ceil(rows/batchSize) calls per
  * partition, ×2 exponential backoff from 500 ms, give-up after
  * maxRetries attempts. Batching/retry/backoff are asserted from the
  * server's request log and an injected (recording, non-sleeping)
  * sleeper — no timing assertions, nothing flaky.
  */
class BatchedEmbedderHttpSpec extends AnyFunSuite with SharedSpark {
  import BatchedEmbedderHttpSpec._

  /** Protocol: POST body = texts joined by \n; 200 body = one line per
    * text, each `dim` comma-separated floats (text length replicated —
    * deterministic and value-checkable).
    */
  private def startServer(failFirst: Int): com.sun.net.httpserver.HttpServer = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/embed", { exchange =>
      val texts = new String(
        exchange.getRequestBody.readAllBytes, "UTF-8").split("\n", -1).toSeq
      val fail = synchronized {
        requestSizes.add(texts.size)
        requests.incrementAndGet() <= failFirst
      }
      if (fail) {
        exchange.sendResponseHeaders(500, -1)
        exchange.close()
      } else {
        val body = texts.map(t =>
          Array.fill(Dim)(t.length.toFloat).mkString(",")).mkString("\n")
        val bytes = body.getBytes("UTF-8")
        exchange.sendResponseHeaders(200, bytes.length.toLong)
        exchange.getResponseBody.write(bytes)
        exchange.close()
      }
    })
    server.start()
    server
  }

  /** The client side of the transport seam — plain HttpURLConnection,
    * serializable via the captured port only (local-mode executors
    * share the JVM, so the stub is reachable).
    */
  private def httpTransport(port: Int): Seq[String] => Seq[Array[Float]] =
    texts => {
      val conn = new java.net.URL(s"http://127.0.0.1:$port/embed")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.getOutputStream.write(texts.mkString("\n").getBytes("UTF-8"))
      if (conn.getResponseCode != 200)
        throw new java.io.IOException(s"embed service: ${conn.getResponseCode}")
      new String(conn.getInputStream.readAllBytes, "UTF-8")
        .split("\n", -1).toSeq.map(_.split(",").map(_.toFloat))
    }

  test("flaky service: batch sizes, retry count, and backoff schedule") {
    import spark.implicits._
    reset()
    val server = startServer(failFirst = 2)
    try {
      val port = server.getAddress.getPort
      val df = (1 to 10).map(i => "x" * i).toDF("text").repartition(1)
      val out = new BatchedEmbedder(
          dim = Dim, batchSize = 4, transport = httpTransport(port),
          maxRetries = 5, initialDelayMs = 500, sleep = recordingSleep)
        .embed(df, "text", "emb")
        .collect()

      // batching: one partition of 10 rows at batchSize 4 → request
      // payloads of 4,4,2 (the first batch seen 3× through the retries)
      assert(requestSizes.toArray(Array.empty[Integer]).map(_.toInt).toSeq
        .sorted == Seq(2, 4, 4, 4, 4))
      // retry count: 2 failures + 3 successes
      assert(requests.get() == 5)
      // backoff schedule: exactly the reference's 500 ms ×2 ladder
      assert(sleeps.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSeq
        == Seq(500L, 1000L))
      // and the vectors are the service's answers, row-aligned
      assert(out.length == 10)
      out.foreach { r =>
        val n = r.getString(0).length.toFloat
        assert(r.getSeq[Float](1) == Seq.fill(Dim)(n))
      }
    } finally server.stop(0)
  }

  test("dead service: gives up after maxRetries attempts, then fails the job") {
    import spark.implicits._
    reset()
    val server = startServer(failFirst = Int.MaxValue)
    try {
      val port = server.getAddress.getPort
      val df = Seq("a", "b").toDF("text").repartition(1)
      val e = intercept[org.apache.spark.SparkException] {
        new BatchedEmbedder(
            dim = Dim, batchSize = 8, transport = httpTransport(port),
            maxRetries = 5, initialDelayMs = 500, sleep = recordingSleep)
          .embed(df, "text", "emb")
          .collect()
      }
      val chain = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(chain.contains("embed service"), s"unexpected failure chain: $chain")
      // exactly maxRetries attempts for the one batch, 4 backoffs between
      assert(requests.get() == 5)
      assert(sleeps.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSeq
        == Seq(500L, 1000L, 2000L, 4000L))
    } finally server.stop(0)
  }
}

/** Static recorders: executor closures and the test share the JVM in
  * local mode, so object state is the cross-thread channel.
  */
object BatchedEmbedderHttpSpec {
  val Dim = 4
  val requests = new java.util.concurrent.atomic.AtomicInteger(0)
  val requestSizes = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
  val sleeps = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
  val recordingSleep: Long => Unit = ms => sleeps.add(ms)
  def reset(): Unit = { requests.set(0); requestSizes.clear(); sleeps.clear() }
}
