package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Cast, ExpressionInfo}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** Session extension registering the engine's native expressions as SQL
  * functions, so `spark.sql("SELECT md5_partition(key, 10) ...")` works the
  * same as the Column API (SURVEY §2.9 — the engine's function-registry
  * analog of the reference's adapter registry).
  *
  * Install via `SparkSession.builder.withExtensions(new GraftExtensions)`,
  * config `spark.sql.extensions=graft.functions.GraftExtensions`, or
  * [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] = Seq(
    (FunctionIdentifier("md5_partition"),
      info("md5_partition",
        "md5_partition(key, n) - reference stream partitioner: abs(int32LE(md5(key))) % n"),
      { args =>
        require(args.size == 2, "md5_partition(key, partitionCount)")
        Md5Partition(Cast(args.head, StringType), Cast(args(1), IntegerType))
      }),
    (FunctionIdentifier("quantized_dot"),
      info("quantized_dot",
        "quantized_dot(a, b) - exact integer dot product of two array<bigint> vectors"),
      { args =>
        require(args.size == 2, "quantized_dot(a, b)")
        QuantizedDot(args.head, args(1))
      }),
    (FunctionIdentifier("md5_int"),
      info("md5_int",
        "md5_int(key, n) - first n hex digits of md5(key) as a BIGINT (n in [1,15])"),
      { args =>
        require(args.size == 2, "md5_int(key, hexDigits)")
        Md5Int(Cast(args.head, StringType), Cast(args(1), IntegerType))
      }),
    (FunctionIdentifier("fingerprint_fold"),
      info("fingerprint_fold",
        "fingerprint_fold(tokens, p) - fold (acc*31 + md5_int(tok, 8)) mod p over an array<string>"),
      { args =>
        require(args.size == 2, "fingerprint_fold(tokens, mod)")
        FingerprintFold(args.head, Cast(args(1), LongType))
      }),
    (FunctionIdentifier("centroid_rank"),
      info("centroid_rank",
        "centroid_rank(v, centroids) - centroid ids by ascending (squared L2, id) " +
          "from array<bigint> v to a foldable array<array<double>> centroid table"),
      { args =>
        require(args.size == 2, "centroid_rank(vector, centroids)")
        // the centroid table is a codegen reference object, so the SQL
        // argument must be a literal evaluable at resolution — exactly the
        // shape the Scala API takes as Seq[Seq[Double]]
        val cexpr = args(1)
        require(cexpr.foldable &&
          cexpr.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
          cexpr.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
            .elementType == org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType, containsNull = false),
          "centroid_rank centroids must be a foldable array<array<double>> literal " +
            "(e.g. array(array(0.0d, 1.0d), ...))")
        val arr = cexpr.eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val table = (0 until arr.numElements()).map { i =>
          val inner = arr.getArray(i)
          (0 until inner.numElements()).map(inner.getDouble).toSeq
        }.toSeq
        CentroidRank(args.head, table)
      }),
    (FunctionIdentifier("kll_quantiles"),
      info("kll_quantiles",
        "kll_quantiles(v, probs, k) - mergeable KLL quantile sketch of a double column; " +
          "probs a foldable array<double> literal, k the compactor capacity"),
      { args =>
        require(args.size == 3, "kll_quantiles(value, probs, k)")
        val pexpr = args(1)
        require(pexpr.foldable, "kll_quantiles probs must be a foldable array<double> literal")
        require(pexpr.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
          pexpr.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
            .elementType == org.apache.spark.sql.types.DoubleType,
          s"kll_quantiles probs must be array<double>, got ${pexpr.dataType.sql}")
        val arr = pexpr.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val probs = (0 until arr.numElements()).map(arr.getDouble).toSeq
        val kexpr = args(2)
        require(kexpr.foldable, "kll_quantiles k must be a literal")
        QuantileSketchAgg(args.head, probs,
          kexpr.eval().asInstanceOf[Number].intValue())
      }),
    (FunctionIdentifier("multi_pattern_count"),
      info("multi_pattern_count",
        "multi_pattern_count(text, patterns) - per-pattern ALL-occurrence (overlapping) " +
          "substring counts in one Aho-Corasick DFA scan; patterns a foldable " +
          "array<string> literal (the automaton is a plan-time reference object)"),
      { args =>
        require(args.size == 2, "multi_pattern_count(text, patterns)")
        val pexpr = args(1)
        require(pexpr.foldable &&
          pexpr.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
          pexpr.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
            .elementType == StringType,
          "multi_pattern_count patterns must be a foldable array<string> literal")
        val arr = pexpr.eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val pats = (0 until arr.numElements()).map { i =>
          val u = arr.getUTF8String(i)
          require(u != null, "multi_pattern_count: null pattern")
          u.toString
        }.toSeq
        MultiPatternCount(args.head, pats)
      }),
    (FunctionIdentifier("cov_stats"),
      info("cov_stats",
        "cov_stats(q) - covariance sufficient statistics of an array<bigint> " +
          "vector column: array<struct<i,j,n,sx,sy,sxy>> over the upper triangle"),
      { args =>
        require(args.size == 1, "cov_stats(quantizedVector)")
        CovStatsAgg(args.head).toAggregateExpression(isDistinct = false)
      }),
    (FunctionIdentifier("unicode_norm"),
      info("unicode_norm",
        "unicode_norm(text, form) - Unicode normalization (NFC/NFD/NFKC/NFKD), " +
          "form a foldable string"),
      { args =>
        require(args.size == 2, "unicode_norm(text, form)")
        UnicodeNorm(Cast(args.head, StringType), Cast(args(1), StringType))
      }),
    (FunctionIdentifier("zorder2"),
      info("zorder2",
        "zorder2(x, y) - Morton interleave of two bigint dims in [0, 2^31) into a 62-bit z-value"),
      { args =>
        require(args.size == 2, "zorder2(x, y)")
        ZOrder2(Cast(args.head, LongType), Cast(args(1), LongType))
      }),
    (FunctionIdentifier("image_header"),
      info("image_header",
        "image_header(data) - parse PNG IHDR / JPEG SOFn+EXIF from a binary column into " +
          "struct<format, width, height, bit_depth, color_type, orientation>; " +
          "corrupt bytes yield ('unknown', -1, ...) rather than an error"),
      { args =>
        require(args.size == 1, "image_header(data)")
        ImageHeader(args.head)
      }),
    (FunctionIdentifier("wav_header"),
      info("wav_header",
        "wav_header(data) - parse a RIFF/WAVE header from a binary column into " +
          "struct<format, audio_format, channels, sample_rate, bits_per_sample, " +
          "n_frames, duration_ms>; corrupt bytes yield ('unknown', -1, ...)"),
      { args =>
        require(args.size == 1, "wav_header(data)")
        WavHeader(args.head)
      }),
    (FunctionIdentifier("mp4_header"),
      info("mp4_header",
        "mp4_header(data) - parse an ISO-BMFF (MP4) header from a binary column into " +
          "struct<format, major_brand, timescale, duration_ms, n_tracks, width, height>; " +
          "corrupt bytes yield ('unknown', ...)"),
      { args =>
        require(args.size == 1, "mp4_header(data)")
        Mp4Header(args.head)
      }),
    (FunctionIdentifier("warc_records"),
      info("warc_records",
        "warc_records(data) - split a concatenated WARC (ISO 28500) byte stream into " +
          "array<struct<offset, warc_type, target_uri, content_length, payload_md5>>; " +
          "parsing stops at the first malformed record, never errors"),
      { args =>
        require(args.size == 1, "warc_records(data)")
        WarcRecords(args.head)
      }),
    (FunctionIdentifier("warc_payloads"),
      info("warc_payloads",
        "warc_payloads(data) - record payloads of a concatenated WARC stream as array<binary>, " +
          "framed by the same bounded walk as warc_records"),
      { args =>
        require(args.size == 1, "warc_payloads(data)")
        WarcPayloads(args.head)
      }),
    (FunctionIdentifier("http_head"),
      info("http_head",
        "http_head(data) - parse an HTTP/1.x response head from a binary column into " +
          "struct<status, reason, content_type, content_length, body_offset, body_md5>; " +
          "non-HTTP bytes yield (-1, '', ...)"),
      { args =>
        require(args.size == 1, "http_head(data)")
        HttpHead(args.head)
      }),
    (FunctionIdentifier("gzip_members"),
      info("gzip_members",
        "gzip_members(data) - split a concatenated multi-member gzip stream (the .warc.gz " +
          "form) into array<binary> of INFLATED members, CRC32/ISIZE-checked; a malformed " +
          "member ends the parse with the members already recovered"),
      { args =>
        require(args.size == 1, "gzip_members(data)")
        GzipMembers(args.head)
      }),
    (FunctionIdentifier("html_text"),
      info("html_text",
        "html_text(data) - strip HTML markup from UTF-8 bytes into " +
          "struct<title, body, n_tags>: script/style content excluded, predefined and " +
          "numeric character references decoded, never errors on hostile input"),
      { args =>
        require(args.size == 1, "html_text(data)")
        HtmlText(args.head)
      }),
    (FunctionIdentifier("tar_entries"),
      info("tar_entries",
        "tar_entries(data) - frame a POSIX ustar archive (the WebDataset shard form) into " +
          "array<struct<name, type_flag, size, offset, payload_md5>>; header checksums " +
          "validated, malformed headers end the parse without error"),
      { args =>
        require(args.size == 1, "tar_entries(data)")
        TarEntries(args.head)
      }),
    (FunctionIdentifier("tfrecord_entries"),
      info("tfrecord_entries",
        "tfrecord_entries(data) - frame a TFRecord shard into array<struct<offset, length, " +
          "payload_md5>>; both masked-crc32c checksums validated, malformed records end " +
          "the parse without error"),
      { args =>
        require(args.size == 1, "tfrecord_entries(data)")
        TfRecords(args.head)
      }))

  /** Register on an existing session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
