package graft.exports

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sink.CsvSink

/** Order-types export (`sql/ordertypes.sql:1-9`): parent self-join by
  * uuid, fixed projection, ordered by order_type_id (J12/O2). */
object OrderTypesExport {

  def pipeline(t: String => DataFrame): DataFrame =
    t("order_type").as("ot")
      .join(t("order_type").as("p"),
        col("ot.parent") === col("p.order_type_id"), "left")
      .select(col("ot.order_type_id").as("order_type_id"),
        col("ot.uuid").as("Uuid"),
        col("ot.retired").as("Void/Retire"),
        col("ot.name").as("Name"),
        col("ot.description").as("Description"),
        col("ot.java_class_name").as("Java class name"),
        col("p.uuid").as("Parent"))

  val columns: Seq[String] = Seq("Uuid", "Void/Retire", "Name",
    "Description", "Java class name", "Parent")

  def export(t: String => DataFrame, outPath: String): Unit =
    CsvSink.write(pipeline(t), columns, Seq(col("order_type_id")), outPath)
}
