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
    */
  def int8Encode(vec: Column): Column = {
    val scale =
      greatest(array_max(transform(vec, x => abs(x.cast("double")))), lit(Eps)) / lit(127.0)
    struct(
      scale.as("scale"),
      transform(vec, x => round(x.cast("double") / scale, 0).cast("tinyint")).as("codes"))
  }

  /** Decoded `array<float>` (the engine's vector surface) from an
    * [[int8Encode]] struct.
    */
  def int8Decode(q: Column): Column =
    transform(q.getField("codes"),
      c => (c.cast("double") * q.getField("scale")).cast("float"))
}
