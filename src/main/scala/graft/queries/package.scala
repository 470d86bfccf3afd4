package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.date_format

package object queries {
  /** Output-boundary date formatting (reference F-DFMT
    * `strftime('%Y-%m-%d')`, dashboard.py:234). All query results emit
    * dates as ISO strings so the oracle compare is representation-exact
    * across engines; ISO strings sort identically to the dates. */
  def iso(c: Column): Column = date_format(c, "yyyy-MM-dd")
}
