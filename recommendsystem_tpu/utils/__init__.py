from .dates import date_range, trained_delta_days  # noqa: F401
