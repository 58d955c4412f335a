package graft

/** Typed domain model mirroring the reference's POJOs (SURVEY.md §1.2).
  *
  * Used with `Encoders.product` at typed-API edges and in Structured
  * Streaming tests; the relational operators stay in DataFrame-land so
  * Catalyst/Tungsten own the layout.
  *
  * Reference shapes: domain/Weather.java:6-11, domain/WeatherAgg.java:9-11,
  * domain/Address.java:9-16.
  */
object model {

  /** One reading / one daily average (Weather.java). `date` stays a String at
    * the boundary — the reference never parses it to a date type. */
  final case class Weather(tmp_f: Double, tmp_c: Double, date: String)

  /** Aggregation output (WeatherAgg.java): daily averages per cell. */
  final case class WeatherAgg(weatherList: Seq[Weather], date: String)

  /** Dimension record (Address.java), enriched with daily averages. */
  final case class Address(
      hash: String,
      country: String,
      city: String,
      address: String,
      name: String,
      id: String,
      avgWeathers: Seq[Weather])

  /** Raw weather reading as it arrives on the wire (FIXTURES.md §A1). */
  final case class RawWeather(
      lat: Double, lng: Double, wthr_date: String, avg_tmpr_f: Double, avg_tmpr_c: Double)

  /** Keyed event for streaming tests (events-table shape). */
  final case class Event(
      event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)
}
