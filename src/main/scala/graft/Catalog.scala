package graft

/** Generates docs/OPERATORS.md — the user-facing operator catalog — straight
  * from the live registry, so the document can never drift from the code:
  * every entry is a registered, oracle-gated query. Run:
  * {{{ sbt "runMain graft.Catalog" }}}
  */
object Catalog {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("docs/OPERATORS.md")
    val groups: Seq[(String, Seq[GraftQuery])] = Seq(
      "Scans / filters / predicates" -> operators.Scans.all,
      "Joins" -> operators.Joins.all,
      "Aggregations" -> operators.Aggregates.all,
      "Window functions" -> operators.Windows.all,
      "Sorts / top-k / set operations" -> operators.SortsSets.all,
      "Scalar functions" -> functions.Scalars.all,
      "Time series (batch)" -> operators.TimeSeries.all,
      "Geo / packet analytics" -> operators.Geo.all,
      "Graph analytics" -> operators.Graph.all,
      "Rank / resampling statistics" -> operators.RankStats.all,
      "Series decomposition / mining" -> operators.SeriesDecomp.all,
      "Data quality / retrieval" -> operators.QualityOps.all,
      "Warehouse maintenance" -> operators.Warehouse.all,
      "Text / dedup primitives" -> functions.TextOps.all,
      "Vector / similarity" -> functions.VectorOps.all,
      "Dedup at corpus scale" -> functions.DedupOps.all,
      "Text analysis" -> functions.TextAnalysis.all,
      "Pipeline / curation / statistics" -> functions.PipelineOps.all,
      "Approximate nearest neighbor" -> functions.Similarity.all,
      "Multimodal (binary media)" -> functions.Multimodal.all,
      "UDAF surface" ->
        (functions.VectorAggregates.all ++ functions.SketchAggregates.all),
      "Typed (Dataset) surface" -> functions.TypedOps.all,
      "Sources / formats" ->
        (sources.FormatSources.all ++ sources.BucketedLayout.all),
      "Structured Streaming (oracle-gated)" -> streaming.StreamQueries.all)

    // drift guard: the catalog must cover the registry exactly — a module
    // registered in SparkEntry but absent here (or vice versa) fails loudly
    val catalogNames = groups.flatMap(_._2).map(_.name).toSet
    val registryNames = SparkEntry.registry.map(_.name).toSet
    require(catalogNames == registryNames,
      s"catalog/registry drift: missing=${registryNames -- catalogNames} " +
        s"extra=${catalogNames -- registryNames}")

    val sb = new StringBuilder
    sb.append("# Operator catalog\n\n")
    sb.append("Generated from the live `SparkEntry` registry by " +
      "`graft.Catalog` — every entry below is a registered query with a " +
      "DuckDB oracle twin (or a documented rows-only gate). Regenerate " +
      "with `sbt \"runMain graft.Catalog\"`.\n")
    val total = groups.map(_._2.size).sum
    sb.append(s"\nTotal: **$total operators** in ${groups.size} families.\n")
    groups.foreach { case (title, qs) =>
      sb.append(s"\n## $title (${qs.size})\n\n")
      qs.foreach { q =>
        val oracle = if (q.oracle.isDefined) "" else " *(rows-only gate)*"
        // first sentence of the doc string keeps the catalog scannable
        val head = q.doc.split("(?<=[.!?])\\s+").headOption.getOrElse(q.doc)
        sb.append(s"- **`${q.name}`**$oracle — $head\n")
      }
    }
    val outPath = java.nio.file.Paths.get(out).toAbsolutePath
    java.nio.file.Files.createDirectories(outPath.getParent)
    java.nio.file.Files.writeString(outPath, sb.toString)
    println(s"[catalog] wrote $out ($total operators)")
  }
}
