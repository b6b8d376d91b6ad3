package graft.queries

import graft.operators.{Clustering, Containers, CorpusOps, CorpusStats, Dedup, EventOps, Feedback, Forecast, HtmlOps, Integrity, IntervalOps, Learn, Multimodal, Projection, Relational, Relational3, RelationalExt, Similarity, Sketches, StatTests, TextOps, Transforms, Unigram, UrlOps, WordPiece}
import graft.sources.{LayoutOps, Sources}
import graft.streaming.EventStreams

/** Single source of truth for the declared query inventory (SURVEY.md §2).
  * SparkEntry.queries / SparkEntry.oracleSql are both derived from this Seq —
  * the two driver-facing maps cannot drift.
  */
object Registry {

  val entries: Seq[Entry] =
    Relational.entries ++
      RelationalExt.entries ++
      Relational3.entries ++
      Relational3.entries2 ++
      EventOps.entries ++
      EventStreams.entries ++
      TextOps.entries ++
      Transforms.entries ++
      Transforms.entries2 ++
      Transforms.entries3 ++
      Dedup.entries ++
      Dedup.entries2 ++
      Similarity.entries ++
      Similarity.entries2 ++
      Similarity.entries3 ++
      Multimodal.entries ++
      Multimodal.entries2 ++
      Multimodal.entries3 ++
      Multimodal.entries4 ++
      Sources.entries ++
      LayoutOps.entries ++
      CorpusOps.entries ++
      CorpusOps.entries2 ++
      Clustering.entries ++
      Clustering.entries2 ++
      CorpusStats.entries ++
      CorpusStats.entries2 ++
      Integrity.entries ++
      Integrity.entries2 ++
      Integrity.entries3 ++
      StatTests.entries ++
      StatTests.entries2 ++
      Learn.entries ++
      Forecast.entries ++
      IntervalOps.entries ++
      Projection.entries ++
      Feedback.entries ++
      Unigram.entries ++
      Sketches.entries ++
      Containers.entries ++
      UrlOps.entries ++
      UrlOps.entries2 ++
      WordPiece.entries ++
      HtmlOps.entries

  require(
    entries.map(_.name).distinct.size == entries.size,
    s"duplicate query names in registry: ${entries.map(_.name).diff(entries.map(_.name).distinct)}")

  def byName(name: String): Entry =
    entries
      .find(_.name == name)
      .getOrElse(throw new NoSuchElementException(s"no query named $name"))
}
