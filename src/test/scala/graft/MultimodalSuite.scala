package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSuite extends SparkTestBase {

  test("decode is deterministic and batch-shaped") {
    val in = (0 until 150).map(i =>
      Multimodal.MediaIn(i.toLong, Array.fill(i + 1)(7.toByte)))
    val out = Multimodal.decodePartition(in.iterator).toSeq
    assert(out.size == in.size) // batching must not drop or duplicate rows
    assert(out.map(_.doc_id) == in.map(_.doc_id)) // order preserved
    val again = Multimodal.decodePartition(in.iterator).toSeq
    assert(out == again)
    out.foreach { m =>
      assert(m.width >= 16 && m.height >= 16 && m.channels >= 1 && m.frames >= 1)
    }
  }

  test("q43 scan reads only the needed columns (payload pruned upstream)") {
    val plan = Multimodal.mediaMeta(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"), plan)
    assert(!plan.contains("lang"), "unused fixture columns must not be scanned")
  }

  test("q43 output schema carries typed metadata, no binary column") {
    val df = Multimodal.mediaMeta(spark, sf)
    val fields = df.schema.fieldNames.toSet
    assert(fields == Set("doc_id", "n_bytes", "width", "height", "channels", "frames"))
    assert(!df.schema.fields.exists(_.dataType.typeName == "binary"))
    assert(df.limit(5).collect().length == 5)
  }
}
