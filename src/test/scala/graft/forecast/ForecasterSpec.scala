package graft.forecast

import graft.SparkSpec
import java.time.LocalDate
import java.sql.Date

/** Forecaster contract (FIXTURES.md §2): schema, horizon dates, sanity
  * bounds on the reference's golden daily summary, and exact recovery
  * of noiseless trend + weekly patterns (the model class itself).
  */
class ForecasterSpec extends SparkSpec {

  private val d0 = LocalDate.of(2024, 2, 1)

  test("recovers a pure linear trend (near-)exactly") {
    val dates = (0 until 14).map(d0.plusDays(_)).toArray
    val y = dates.indices.map(i => 100.0 + 7.5 * i).toArray
    val m = Forecaster.fit(dates, y)
    val pred = m.predict(14, d0.plusDays(14))
    assert(math.abs(pred - (100.0 + 7.5 * 14)) < 1.0)
    val met = Forecaster.metrics(m, dates, y)
    assert(met.mae < 1.0 && met.mse < 1.0)
  }

  test("recovers trend + day-of-week seasonality") {
    val dates = (0 until 28).map(d0.plusDays(_)).toArray
    def dowBoost(d: LocalDate): Double = if (d.getDayOfWeek.getValue >= 6) 50.0 else 0.0
    val y = dates.indices.map(i => 200.0 + 2.0 * i + dowBoost(dates(i))).toArray
    val m = Forecaster.fit(dates, y)
    val met = Forecaster.metrics(m, dates, y)
    assert(met.mae < 2.0, s"weekly pattern not captured: mae=${met.mae}")
  }

  test("forecast on the golden daily summary: schema, date, sane bounds") {
    // golden daily_summary values (FIXTURES.md §2)
    val rows = Seq(
      ("2024-02-01", 217492.91, 182618.10), ("2024-02-02", 144612.09, 121085.35),
      ("2024-02-03", 37698.49, 31337.27), ("2024-02-04", 56016.12, 46681.86),
      ("2024-02-05", 260173.76, 217579.22), ("2024-02-06", 277835.37, 230902.75),
      ("2024-02-07", 116761.64, 97103.90), ("2024-02-08", 192048.78, 160285.07),
      ("2024-02-09", 78341.15, 65536.60), ("2024-02-10", 158822.56, 132860.39))
    val df = spark.createDataFrame(rows.map { case (d, s, p) =>
      (Date.valueOf(d), s, p)
    }).toDF("date", "total_sales", "total_profit")

    val out = Forecaster.forecast(df, horizon = 1)
    assert(out.columns.toSeq === Seq("date", "forecasted_sales", "forecasted_profit"))
    val r = out.collect().head
    assert(r.getDate(0).toLocalDate === LocalDate.of(2024, 2, 11))
    val sales = r.getDouble(1)
    val profit = r.getDouble(2)
    // sanity window: within [0.5×min, 1.5×max] of the training series
    assert(sales > 37698.49 * 0.5 && sales < 277835.37 * 1.5, s"sales=$sales")
    assert(profit > 31337.27 * 0.5 && profit < 230902.75 * 1.5, s"profit=$profit")
    assert(profit < sales)
  }

  test("multi-day horizon produces consecutive dates") {
    val dates = (0 until 10).map(d0.plusDays(_)).toArray
    val df = spark.createDataFrame(
      dates.indices.map(i => (Date.valueOf(dates(i)), 100.0 + i, 50.0 + i))
    ).toDF("date", "total_sales", "total_profit")
    val out = Forecaster.forecast(df, horizon = 3).collect()
    assert(out.map(_.getDate(0).toLocalDate).toSeq ===
      (1 to 3).map(h => d0.plusDays(9 + h)))
  }
}
