package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables
import graft.cql.Cql
import graft.cql.Cql.{NumberField, TextField}

/** The CQL query front-end (P1/O1) driven through the gate: a realistic
  * reference-style listing — typed-field CQL with boolean logic and sortBy —
  * compiled to Catalyst columns over the orders table.
  */
object CqlQueries {

  val all: Seq[Q] = Seq(
    Q("q31_cql_listing",
      (s, d) => {
        val t = Tables(s, d)
        val fields = Map(
          "o_orderstatus" -> TextField,
          "o_orderpriority" -> TextField,
          "o_totalprice" -> NumberField,
          "o_orderkey" -> NumberField)
        val parsed = Cql.parse(
          "(o_orderstatus = F or o_orderstatus = P) and o_totalprice > 400000" +
            " not o_orderpriority = \"1-URGENT\"" +
            " sortBy o_totalprice/sort.descending o_orderkey",
          fields)
        parsed(t.orders)
          .select(col("o_orderkey"), col("o_orderstatus"),
            round(col("o_totalprice") * 100).cast("long").as("price_cents"))
      },
      Some("""SELECT o_orderkey, o_orderstatus,
             |  CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
             |FROM orders
             |WHERE (o_orderstatus = 'F' OR o_orderstatus = 'P')
             |  AND o_totalprice > 400000 AND NOT o_orderpriority = '1-URGENT'
             |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin))
  )
}
