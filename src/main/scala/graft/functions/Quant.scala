package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** INT8 scalar quantization for vector storage — the reference's third
  * vector value type (`FLOAT | BINARY | INT8`, index/retrieval_model.h:18;
  * int8 raw vectors store one byte per component). Symmetric per-vector
  * quantization (faiss SQ8-style): `scale = max|v| / 127`, `code_i =
  * round(v_i / scale)` in [-127, 127], decode `code_i * scale` — 4x
  * smaller vector storage at ~0.4%-of-range max error.
  *
  * Pure Column expressions (codegen'd, no UDFs), double math over float
  * inputs so the DuckDB oracle mirrors every step bit-for-bit.
  */
object Quant {

  /** Guards the all-zero vector (scale 0 would NaN the division). */
  val Eps = 1e-30

  /** `struct(scale double, codes array<tinyint>)` from an `array<float>`
    * column.
    *
    * The scale is bound ONCE per row as a lambda variable (the outer
    * transform runs over a one-element array): higher-order-function
    * lambdas re-evaluate captured expression trees per element, so
    * embedding the O(d) array_max scan directly in the codes lambda would
    * make encoding O(d^2) per vector — and the optimizer's project
    * collapsing can re-inline a separately-projected scale column right
    * back into the lambda.
    */
  def int8Encode(vec: Column): Column = {
    val scale =
      greatest(array_max(transform(vec, x => abs(x.cast("double")))), lit(Eps)) / lit(127.0)
    element_at(
      transform(array(scale), s =>
        struct(
          s.as("scale"),
          transform(vec, x => round(x.cast("double") / s, 0).cast("tinyint")).as("codes"))),
      1)
  }

  /** Decoded `array<float>` (the engine's vector surface) from an
    * [[int8Encode]] struct.
    */
  def int8Decode(q: Column): Column =
    transform(q.getField("codes"),
      c => (c.cast("double") * q.getField("scale")).cast("float"))
}
