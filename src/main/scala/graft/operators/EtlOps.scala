package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, MapType, StringType}

/** Set-at-a-time re-expression of the reference's record-level ETL library
  * (`/root/reference/common/aws_utils/` + `src/handlers.py`). Each function is
  * a Column→Column (codegen-friendly, stays inside WholeStageCodegen) or a
  * DataFrame split; no UDFs, no driver-side loops.
  */
object EtlOps {

  /** JSON props-string → nullable map (the reference's
    * `event['queryStringParameters'] or {}` shape —
    * `common/aws_utils/api_gateway.py:48`). */
  def propsMap(props: Column): Column =
    from_json(props, MapType(StringType, IntegerType))

  /** R4/R5/R22 (`api_gateway.py:18-60`, `handlers.py:37-42`): pull a named
    * key from a nullable map with a default when absent. */
  def paramOrDefault(map: Column, key: String, default: Column): Column =
    coalesce(element_at(map, key), default)

  /** R4 required=True arm: status marker instead of a thrown exception —
    * the set-at-a-time equivalent routes the row to the error branch. */
  def requiredStatus(map: Column, key: String): Column =
    when(element_at(map, key).isNull, lit("MISSING_REQUIRED")).otherwise(lit("OK"))

  /** R7 (`handlers.py:32`): extract the token from an Authorization header.
    * Returns '' on non-match (both Spark and DuckDB semantics). */
  def bearerToken(header: Column): Column =
    regexp_extract(header, "Bearer\\s+(.+)", 1)

  /** R11 (`handlers.py:34-47`): 3-way token classification. The reference
    * try/excepts jwt.decode; set-at-a-time this is a when-chain over a
    * malformed predicate and an expiry claim. */
  def classifyToken(token: Column, expired: Column): Column =
    when(token === "", lit("invalid"))
      .when(expired, lit("expired"))
      .otherwise(lit("valid"))

  /** R22 (`handlers.py:37-42`): principal with fallback for non-valid rows. */
  def principalOrUnknown(status: Column, token: Column): Column =
    when(status === "valid", token).otherwise(lit("unknown_user"))

  /** R21 (`handlers.py:59`): authorization effect projection. */
  def effect(authorized: Column): Column =
    when(authorized, lit("Allow")).otherwise(lit("Deny"))

  /** R16 (`api_gateway.py:86-92`): header-map overlay, right wins
    * (dict.update semantics). Duplicate keys are removed BEFORE the
    * concat (defaults filtered to keys absent from extra), so the
    * semantics are self-contained — independent of the session's
    * `spark.sql.mapKeyDedupPolicy`, which stays at its fail-loud
    * EXCEPTION default for every other map in the session. */
  def mergeHeaders(defaults: Column, extra: Column): Column =
    map_concat(map_filter(defaults, (k, _) => !map_contains_key(extra, k)),
      extra)

  /** R20 (`api_gateway.py:95`): status-code normalization str(int(x)). */
  def normStatus(code: Column): Column =
    code.cast(IntegerType).cast(StringType)

  /** Routed record streams from an error split (R19, `api_gateway.py:99-123`). */
  final case class Routed(good: DataFrame, errors: DataFrame)

  /** R19/R25: split a frame into clean rows and ErrorResponse-shaped records
    * (`swagger_api_models.yml:20-32` — {description, error} + status code).
    * Both sides stay lazy DataFrames; at scale this is one scan feeding two
    * filter branches, not two scans (Spark reuses the exchange under AQE). */
  def errorSplit(df: DataFrame, isError: Column, error: Column,
      description: Column, statusCode: Column): Routed = {
    // NULL-total contract: a row whose predicate evaluates to NULL
    // (three-valued logic) must not vanish from BOTH branches — the
    // split's invariant is good + errors = input. An undecidable row
    // is not an error, so NULL routes to `good`.
    val err = coalesce(isError, lit(false))
    Routed(
      good = df.filter(!err),
      errors = df.filter(err).select(
        error.as("error"),
        description.as("description"),
        normStatus(statusCode).as("status_code")))
  }
}
