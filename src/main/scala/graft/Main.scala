package graft

import org.apache.spark.sql.SparkSession

import graft.streaming.{FileTransport, HttpKinesisTransport, KinesisTransport, RetryingTransport, StreamPipeline}

/** CLI entry point mirroring the reference's flag surface (main.go:27-52):
  *
  * {{{
  * spark-submit --class graft.Main graft.jar \
  *   --topic events --channel graft \
  *   --nsqd-tcp-address host1:4150,host2:4150 \
  *   --stream my-stream \
  *   --kinesis-endpoint http://localhost:4567/ \
  *   --test                       # create the stream first (kinesalite dev)
  * }}}
  *
  * Wires `readStream.format("nsq")` → [[StreamPipeline]] (dedup → pack →
  * chunk) → HTTP Kinesis transport with retry/backoff. Without
  * `--kinesis-endpoint`, entries land in a local file sink (a dry-run
  * stand-in). Requests are SigV4-signed when the standard AWS env vars
  * (`AWS_ACCESS_KEY_ID`/`AWS_SECRET_ACCESS_KEY`, optional
  * `AWS_SESSION_TOKEN`) are present — the same static-credential leg of
  * the SDK default chain the reference relies on (main.go:77-97);
  * unsigned otherwise (kinesalite dev mode).
  */
object Main {

  private val usage =
    """graft: NSQ → dedup → KPL-pack → Kinesis, on Structured Streaming
      |  --topic <t>                NSQ topic (required)
      |  --channel <c>              NSQ channel        [graft]
      |  --nsqd-tcp-address <h:p,>  nsqd endpoints     [localhost:4150]
      |  --nsqd-http-address <h:p,> nsqd stats endpoints, aligned with
      |                             --nsqd-tcp-address [tcp port + 1]
      |  --lookupd-http-address <h:p,>  discover nsqds from nsqlookupd instead
      |  --stream <s>               Kinesis stream     (required)
      |  --kinesis-endpoint <url>   Kinesis-API HTTP endpoint (kinesalite ok)
      |  --region <r>               SigV4 signing region [us-east-1]
      |  --sink-dir <dir>           file-sink fallback [/tmp/graft-sink]
      |  --checkpoint <dir>         checkpoint dir     [/tmp/graft-cli-ckpt]
      |  --test                     CreateStream before starting (main.go:88-96)
      |""".stripMargin

  def main(args: Array[String]): Unit = {
    val opts = parse(args.toList, Map.empty)
    val topic = opts.get("topic")
    val stream = opts.get("stream")
    if (topic.isEmpty || stream.isEmpty) {
      // reference: "You must specify a Kinesis stream name and NSQ topic"
      System.err.println(usage)
      sys.exit(-1)
    }

    val spark = SparkSession.builder()
      .appName("graft")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate()

    val transport: KinesisTransport = opts.get("kinesis-endpoint") match {
      case Some(endpoint) =>
        val creds = for {
          id <- sys.env.get("AWS_ACCESS_KEY_ID")
          secret <- sys.env.get("AWS_SECRET_ACCESS_KEY")
        } yield graft.streaming.SigV4.Credentials(id, secret, sys.env.get("AWS_SESSION_TOKEN"))
        val http = new HttpKinesisTransport(endpoint,
          region = opts.getOrElse("region", "us-east-1"), credentials = creds)
        if (opts.contains("test")) http.createStream(stream.get)
        new RetryingTransport(http)
      case None =>
        new FileTransport(opts.getOrElse("sink-dir", "/tmp/graft-sink"))
    }

    val sourceBase = spark.readStream
      .format("nsq")
      .option("topic", topic.get)
      .option("channel", opts.getOrElse("channel", "graft"))
    val source = (opts.get("lookupd-http-address") match {
      case Some(lk) => sourceBase.option("lookupd", lk)
      case None =>
        val base = sourceBase.option("hosts", opts.getOrElse("nsqd-tcp-address", "localhost:4150"))
        opts.get("nsqd-http-address").fold(base)(base.option("statsEndpoints", _))
    }).load()

    val query = StreamPipeline.build(
      source, transport,
      StreamPipeline.Options(
        streamName = stream.get,
        checkpoint = opts.getOrElse("checkpoint", "/tmp/graft-cli-ckpt"))).start()

    sys.addShutdownHook(query.stop()) // graceful drain, main.go:128-140
    query.awaitTermination()
  }

  @annotation.tailrec
  private[graft] def parse(args: List[String], acc: Map[String, String]): Map[String, String] =
    args match {
      case Nil => acc
      case "--test" :: rest => parse(rest, acc + ("test" -> "true"))
      case flag :: value :: rest if flag.startsWith("--") && !value.startsWith("--") =>
        parse(rest, acc + (flag.stripPrefix("--") -> value))
      case flag :: rest if flag.startsWith("--") =>
        parse(rest, acc + (flag.stripPrefix("--") -> "true"))
      case other :: _ =>
        System.err.println(s"unknown argument: $other\n$usage")
        sys.exit(-1)
    }
}
