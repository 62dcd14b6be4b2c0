-- reference examples/table_to_daily_parquet_file/start.sql:1-14 — probe
-- already-exported partitions (the s3 listing becomes the `target` view);
-- empty target → start from the source's FIRST day, not epoch day 0
-- (which would plan ~20k empty one-day batches).
select case
    when (select count(*) from target) = 0
    then (select min(datediff(to_date(timestamp), date'1970-01-01')) from source)
    else (select max(datediff(date, date'1970-01-01')) + 1 from target)
end as start
