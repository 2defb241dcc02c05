"""Runnable pipeline entry points (spark-submit / cron jobs)."""
