"""TIFF conformance against the system libtiff (`libtiff.so.6`) —
the same independent-implementation bar as libjpeg-turbo/libpng/
libwebp/giflib. These tests EXIST because writing them immediately
found a real mirrored bug: both our TIFF-LZW encoder and decoder
widened the code width one entry early, so every self-round-trip
passed while every stream desynced against libtiff exactly at the
9-to-10-bit boundary (fixed in ops/tiffcodec.py; thresholds now pinned
here in both directions).

Sections: committed known-answer vectors (libtiff-written streams —
LZW crossing the width boundary, LZW + horizontal-differencing
predictor 2, PackBits; hold with no library), direction A (our encoder
-> TIFFReadRGBAImageOriented) and direction B (TIFFWriteScanline ->
our decoder) live via a TIFFClientOpen in-memory stream. ctypes
gotcha encoded here: TIFFGetField/TIFFSetField are varargs — their
FIXED argtypes prefix must be declared or the TIFF* handle truncates
to 32 bits and segfaults.
"""

from __future__ import annotations

import base64
import ctypes as C
import ctypes.util
import hashlib

import numpy as np
import pytest

from sqlpp_spark.ops.tiffcodec import decode_tiff, encode_tiff

KAT = {
    "lzw_rgb_boundary": (
        b'SUkqAJ4VAACAJlxEp6u0cotAic4vVgl1sKlIAo3IUWqF2AxBiZbCF4sEaOF8LMog'
        b'x7tQlGpOvp2E0oP4DHtIoMmmJTMttGokmcYiF7Gw7PRGm4IgwtCxPq87jsgDwNvl'
        b'hCxOH5TLwrsI9DF3FtRNEmDEsPIfK8lD5NNgsjcnsIINkrsdlh0yMA1DRYDtDjAi'
        b'kpFDB0GhKJosqR7j1jMBfqx3rwioFYhwCr0wLZmPpVBk0k9jGs9jVhlpOmIFKxpH'
        b'ELnFYnQmAxNuwtG0Bt1Zj9DDALuhpsY5kwkL5lgldM1xi9zJYIDZbmI3oBdg4mGF'
        b'OqFPldsr9qO04ttKpcfFVLK9ZGBMhcIHolt0BttTigjgEVj0wONBJ85NR0A9/pQY'
        b'mYCGsLKtsFOCJ6iuSoDgICJDCAERZiMI5lkcLwMGcLA0mqaIFnsDh6GkNYkBAPJq'
        b'COZRmhWSBpBMV5LiIKBSDcPA3G6K5/GwS5VEoEAQmOIhfAYO42kAEZ7geD5bGIRY'
        b'7nmKhIk8Yh6nMDo+h4PJznCWAzFsCpYGMbBIicH4dE0SRXB0WgsFCWQAmKU5WBIJ'
        b'pMhgdxOkgH5FEEcBCkcI5wlEb5yD0IYfHSOYNFGQJhnsVZJPYbgjGyGRxluKBpli'
        b'aojl+EBWGEIJeNMHQImKBoIE4KwcFYTpgDsA5QBYAJWgSNJDCYRBRj+QhagSDgwH'
        b'oXxCCkE4+FIOZtkCH5GhqcppH4XooEcJQAhKa4+h2EZ8nsGJkGYXZCC4fAHGMU58'
        b'DGTgHA4VBTloQxinab4XFsaobiGWI6nIQZsiQCYNH8DAuGcLxGiIQIcBQJJBhoRh'
        b'PnKKxFmEHALD0MZvlYJgdjwLYdCCXQPFCLx5mCUoykwSpPH2awDCuXQgAINI4CWS'
        b'g0iCcRSiEAQokwORFmwD5ggGMQEgSNBmn4RoeFca4cn8aZnHYf4cDUSxtCsCh8kA'
        b'AQiHsXAxmwTI1l8TZ6kYeB/HcDBwE0egymwRoAkGOQvEIVpMCybYshwMhMGueYMA'
        b'8KIBj2awRjYcY7G4XJWBsBQjlicozAiRRUjqBI3iCAZRlQBYihOFJmGoaJYIETJ5'
        b'DkNIvEeRQhnEQY4CKBBgmAdJiG4JZ5HGWYiEAVAEnwOh+lWYRqlyBgPCUd4SACOh'
        b'jEIBg5GSR4qluMZXjSBhfESLZ9C6bxVGAfR4EGFR/BGJJeG2Z4GCEFJ3DcNBlFmf'
        b'5BmoCh4FgUArnMMB7BcCocCyDoYmaOANAnN5CqGYdgehyjEGyCEVAlxJBdHcOoOA'
        b'KwQD5BCHAGohBoBxGGGQMApRnjsEoIoIgMgnBaAkF4UY/BhgbFKBYdoXQCCBGEAU'
        b'IIvR/A3EOD8ZQxAKjUFGBkFISxCCwEEKsEApQuAtHeKQI42Q+ioHgLoIQTg/jQEO'
        b'PcRIZQ9iGCwPAUAFQsAPFUN4YYshCDPD8L0SYKwhA9A4IYAA7R5gWF2FYMYbxDDy'
        b'CYG8DoSg8gkFePgEIzBjjpCiPoVgfgqBJH+P0TYFAqhBBABAJAWQ2DYGmOoQI6x/'
        b'g3FEBwXoQwcg3E+BsbYr2ZBeHwJEZoRwNBfCKDgOAQRACFGgG4RoGhICrEmGQFQp'
        b'BxgmCiHIWwIwRiXDSJ0dglxABLHWE4IQHRfB6FIKgZ4dQSjpBwMgT45xrBHE0KYd'
        b'QhhfD8AUIUdowwnBVCuGYSwxgYAbEEFECgAg9iIC6F4PQjxtgzDCH4JIRxMj3A0N'
        b'sZooQTAKH6BkRIXgmgFHsMULwBQehVG2FQfwAQYhzAgMoDonwyi/CQC4I44gPg6C'
        b'oNkLA6A/gVAABMNY5wzCRF6OMO4ewzgNGsNEUgHg8AgBaLkI40QFCOC0J4AQGB1g'
        b'CDOB4R4mggBVCSOEb4uBVB8HSCMdgbBlhADCGMII6h9g5HwIsAoRQ2CCBcN4ZwEB'
        b'EhmDOKYPY1QbBmEOIAMATwrDfH8CkP43BUhyF8OIUIeAVA7HeAEK49RZgTGoC8YQ'
        b'5wyhBEwKYfA0QwhCAID4cwEhajkEgOETxzAdihAeMYHw8BfjtA+GoYYwBSjYC+Ec'
        b'CwaANjNG0IAVYeRNgCGcPwfQYhmi5EoEKwguQ2BBBWAELI7AEgTBmP4E4yRiguCi'
        b'AcGAmQ2iUCmHcE4NgLDkB8BcIAJwoCoGUIMbYIx5hoAcK8F46RUAiBqNwaonR6B8'
        b'CSPcN43xzheB6M8QARQXANAMPcTQYAWB9BKMUbYDQLAAHiJ0DYTRNAQFOLkeocAY'
        b'ioEmKgJoHQbjNAYDsQIBR5DxDWOQYodgzDHHiJAcQnw6CVEMJULYXAZBHF6JQe4o'
        b'A4DFHcDsKw+h3ApF8PMXYkwii+AIEEGgaBkD8HJOMQIQBZi0G0HILQmheAFDaBAN'
        b'wJhTBnAAGMD43hUiqD+PAWoYQVgPGYEcOIywzD5GyO4C4JxVjbGiCQOocRLhxDIN'
        b'MLQawsgsB0CoFo1w/ioCkJ4OwpAZiLF+OgLBAYAXSEDQkVgSMCWnRgSWg5lAeGUJ'
        b'GUb1GJGKMVoKVgwAIHi6kEwbXYuWAZTW7mUVDuqnsRV+jA4aUcG0IUjuimsLluDA'
        b'UVX+Qh8jCavAoj1EDw6Fh0RgWJiex0Kd26u0+Tzq8i4gTqHBCeGScVs8UoFSOjAm'
        b'MWCPyuuiiOm4LGwvgSsj22WILhcmnEOBO9n0flQfXQB3QlH2cyuwggU2UcyWcVWP'
        b'VkGTaM16xl06muuFI9DweWkaAAwWmHlOOjehhKlhyoVyQ0AXkiSwynUqjEiLRunl'
        b'ynD0N0UHFmRFeyTmpGeeiucUwOlgdCs5W2yFMblyMmyhDQjzaNgGlhOAxUSDMJEe'
        b'ZFwixALGCbEEal0fBY628xnOLEw5R42EiVmuMYhBiAhXlSCwpmkTZoiAc4bisGQw'
        b'hsTh7k+JgSk2awGGgI4XnWA4ZmsYYXjsM4nhETp8jQPBOh6dI6gIK4ejqPIHBIDB'
        b'Bl6W4LEURhJhkFhVi6DIwheDI5iGNBJBWeAQBuDxvFCJ4ZjOPJQG6OhXhGTAKCiJ'
        b'pDlsGIbh0FBrj6dg/C4JB0HEbh5CEIpXkCMpBmYBAWDCRZTDaMomnSPZtCQe5kGa'
        b'bhbjyZRFkuf4PDcFxhl2LZ7hYXRKhuCB5GIFRAD0HQgggAg7gqIJunmTIrFWUYMm'
        b'eNQ/EeZg8nQMxCG2QhxHgdR7C+RgTGUBh1mwZZlEIFh6AyIB1GiA4khmJIjiuKRm'
        b'kudIdBmapzAmKp8lwCBmkIaQ0jiLANFKGRhE4I5gkMI5VAwdgfleFRPi4JgiBWWp'
        b'HiwTpMl8NgNkCXgHkWThYB6SZpgIAA1BqZBYG0QJTE6MgQB8HYKh6JY2BAAB6ksY'
        b'oPlAXhliqR5LlKbhgHUdQ7ngPROjYIYOBUHBqnAaQYgaUoTiSUw9DUSAxDqfxtho'
        b'EJLl2fIxACI4Jj2aZoA2JJrlcO4HEEA4di8eoYm+JBKi6CofF8DYOhmVoLjsOIgh'
        b'0LY0mac4lD+Yx8BaC4VHu35OgoKQhHYBYsh8XJQD0HJNm6ap3j4ShDjWJB8HaIYm'
        b'hsSROmyAhykydxCA6Jp1gkLxnEeUAKHiY5IniU4rkmKJaH+fBKigF4DE2HoUCGZg'
        b'LFaRJoG2dQxhubAODKdxklCIRJg+SxDA+b5xDAdwzEMRBZEgYRmmEcJ8CCAgmgMS'
        b'B/kgaRJAYFhchaMBDCoYBqCQB5LjYIo8FgLCBioNZbH2NIqhQWwmn6SZqBGAuEII'
        b'g8wehfAuBgHwCwIg1BCPkWwXwahjEuFMHoSRjj8CKEISQAxHA/H+KwRofQjAED4L'
        b'0aAvACCeCGLAWAsx3ipEmJcaIrwEAdHsK4X4/Q8jODiA4EokhbhtDkLEaQKx2hoF'
        b'qIoVwbwjgkAQHUJwBxwjXBEK8Vo1hAh/CWLYXgnxsiXBiDkTwbhoDvDKKUQYQgHj'
        b'nGaFIbYLAQhTE4NcbQcBVhRE4OkW46RgDvFMGEBAexxg0FuGAS4ZhrihAkMMBosg'
        b'Sj6AgL4NY6hgjAHyK8DACRBi6D2N0V4cRPCUF0K4KYkhtg7AIJkYYfQsBZCsJYaI'
        b'IACBzGWOIEgMgejzAQJEBYdhXhaByJoHALgWjYBsN0LghgVhGH2G4YA/AthqF4BI'
        b'SwMxPDHAOEMFwKgphwHOE8TIQBRBGAaNocArwci1GGNcCQywrg+FSIMFIBhtDAB+'
        b'JwUAGhYD7H0HcA8dBUBpCwEcRAiB7DqCwIsAogg4ADG8P0HAKAlDRGCH4dIFALCB'
        b'AWBoKIVwCDhHiPsLg+B1BTH2K4bcZwEieG8HIT4MBbBvBEPoYAjRzCvDqN0CImhV'
        b'AlB+EsaQhBJhyDgEAOAIxzAWHkIkSQwB9BGHoIMNYIRNg/DICoRQagXhVCcMcLAT'
        b'hKh3CiHsZ4GhkDrAwA0Z4IwODPFiDQM4UREhfAwMAYQaAzi8HeAgBQzg/gHG2L4D'
        b'AJB1BxHMN8DQhhLgUCWIkQoggthJHuLwCYOwBisHUJAHg9hPhQHMEAC4+BbA9FIL'
        b'0JA8xYj8EuIUGoFBPhfHiCUDQkx8jkH4KAbw6hDhUB2CseoFgXD6CIBgNgi1PBQF'
        b'uPoKgkR+gzDUHIMQixNCsB2AgVAjQNipFeGUNgqwYBoAOM8cV3x7DNFqGIUI2w2j'
        b'dBgCcL4QAcj8DmN0JQhh0D1EiFoV4RByhzDMNMfgUHTChBiOYQAxx1D0ASLsFgFh'
        b'/hoFCPYPgpR6A3PGGUOwfQ/CjDaG0II8gahGAAE8ZgzxjiuESCgVwBhyCxEUOYKg'
        b'kx6iMAGEECoyg9hYBGIYUgtwACrEwE0XoABYCHFyAcXQBg0A4GWKgIIkhLgTGkMc'
        b'aqDR2hQGyEsfQuwyiXGoP4O4uBjh8AYIgOoWxmhGC0Dge4DRtj8FsAcWIvRZBAG6'
        b'D0GoqQWjRuECUHgkx1DEHWDYVAaxnB9DWOAWYqg5hQCgOAX43BCDHF0PYAhAQIAp'
        b'2CdUqsHitDG1BGHUM0RmJn0wn68D4GCM+QQaCGbSy8zA6y4yR+YQ6c1EzEKUSMfQ'
        b'eYRWA1AxzEpQalHI/iGUQgZHyqAKBGEsA+AVoFhEsVYZz40huZDMs3I9FQ4SeuWs'
        b'7nsxgGOisFTAaTa/VeTzC5Q+dA860iOjcei+mBanSqYWAGTyzls+Ba6RAuTWOzmm'
        b'RWyT06kgEEWKneVzaIUGzH8DQCakeeBS32I4CEOxGvAmSiM9kgljuPnIwn0SyYq3'
        b'8kRqPCiTAqW1wX3mXmEzkqBrSgnqXVkHVA0z6LgYukKLz6ZhwSHmeAMgUGeBQjBu'
        b'emKe2SQkSGgiXxUpiWoWqLF2hUgKHIdTE8HY+SKZhewgK2n2LTOrGwMDahAub53F'
        b'OKI2F6A4xgGGAQHafBynMVoYECSQdmQWASEgcJcHAQBem0WYLnWM4lCaBJgncT4q'
        b'kkQYFEQTZrCGG5lCuFZEEYNYhlseICncEJliAQhmCsHh/FoNgJiEDQ7BcLpCEqB4'
        b'gEWcZ8D9KZZCcFovi2UYiGwOxUEqRoUA+SJdniYRgjQEB5GEIZ7EWJZdj6eRZgYH'
        b'xym8BR4k+FItiGbgMAeLxXl0MhLnwGA5l8HxhkMKocAKHZcmOE50iwEB7hEZ5une'
        b'IIkloQ5DAcNRZjWWQtmcJJdFYMg7CaQxnG6SRPBUdouhAVQSm8KgikUAgJmeaIQi'
        b'SMhtACJwwhMXgxiELp3BGKYFHSVwsHoUofmWaQynuUg5AYQwshCCwrlYbhOjgJRG'
        b'hmPhxG6W52l2fBpnKAoMh0SYmDKQYjBiAJfgCZggnYDZzAQXBtnsAQDjSZBsCgQ4'
        b'Zn0WgFjONpaHsGwShochyi4Ig7C4GoLG0X5NEuTIBm0M43AMFQTDiDZAFcfYijQW'
        b'+GFURQyig1ZKlSbw2A6CrxF2Ywci4CAbiATh0lIOJMnYAZ/AEVRTECZQpBoMARCS'
        b'ZRAlKKpDkueA/ikNxwnIdAyj4XJNCOWhImUJJZDkbwHh6V57nOW4Cg8eBRnsDI1E'
        b'oA5TAWeAniCRQihmOx0BkNo5k0ZY4DsYgHF0Mpjg0TY+m4Dh5DAIQfHmNZlFeTwa'
        b'm2eAhl2ZJPDEaY6DGFoqFQNxzgiGVnh8FwvFEOBFHEHpCGibRKjMEQPAGZY6CSNJ'
        b'UApxZrBEGZDiaMZQj8HI6HiSRvjGEAJjEQJmkIPYclONYgCQKIzGWWhuF0AIOCsA'
        b'wLDqFxfCeHYFhOf5jgNEsEQNwagAiDGoCcMo3xfCNGaMgGQpB/A5DQE4N4ewfjnE'
        b'oP8RAngBD7FeCMcgFRqBmGGLYYwNQnAAB+H0N4mgEBXEC5kDQbB0gLGMNgHoTgkj'
        b'AG0LULYrAWBCB4NwXgRxEAMHkCYRgLwiDWEWFQdAogniIBGJwTYQAnjnCsEQfYIg'
        b'vBTDmJQWghhrDZGiN8F4NgmDtCULUMwqhUiwG8OYXyOxDj+G4JwW48BuglHqBMd4'
        b'2QSjbDoCUBQAgQiuDCMIVgeBDgGBCHoMIsx2BQGiKgDITBNCaHyFoG4WQjiQGmP8'
        b'QA7ArD5EIPgf4yQRCsDGOgTQ7hsikGGAcJoIxGDxCmEsQYngmD6GGMsMwnxBiyDQ'
        b'OQEQjxGBhGeOQVobgRBTEiO0OQRgfClCYMEGQNR+CqHKJICg0xhAjDWNoGokR8Cv'
        b'CIHweIuBYgrCqCYSoJx+i/AGOEWgwQ9jqCINEYQExYAMFoM8LQFxOjbFADECYDw9'
        b'jIFIAYPYcgjiYAUCAMYvhRAZH0GwcguhgjhAIIwLY2AaCUEOOkPg/Bmh2DONwW4n'
        b'xfCJBQKcLgVxEgiHANQZYkweDjFeHgRgwxGjdAeNAEATgEjEBgCsSATBbj/AgHYb'
        b'IqQyCqEYAkFYIAriOGyGgP4lgDDmHkAwBAfh6BJH0LsPQSwWg+FEEUXYSgyh2DuP'
        b'UUIFxRi1FEAQFgDwbAmFEIoWQiBMA/F8MEY4jxRhrEqKMSIlRKAjF8EEQQ6hMBgE'
        b'+P0fAGBkCOEQL4MIDBvhLFMAYGoPQvhUAUNQLAXw9COEwEgdQpwOgUBeJsewVx5A'
        b'kCyMAOYIBzguHuF0XwGQGDuGiCYZwNwPhFFuFUKgewjCNAUL0V4GAaClDgMIGwtg'
        b'ZgxB2B8TwHAZC/omEQWw+Q6h5B0KgW4tgyCkGKNIToEw5DdCQKkfoKRMjtBOHASY'
        b'0xdh8ESEQW4BwPiPBEGEc4UhiBnEiJ8AwvBSAeEKG0VYPxMCsGWPELIjREDgB6EY'
        b'VI6xbD6A4D8RI9wyC+BqOEBgLgxirGkOoCwyQ5j1DSG4ao9pjj+AMOMXQnQCDwGa'
        b'MUcoLgEgjFkDsYoIRqjGEwAYWoMgZgwH4LAVYpRwgxB0FUXgAxzACAENgLgoQWAM'
        b'E2OwOghxSi0AQMMFgzBpDeEoBMWITQeCnEkMMHoeA3BBCmNgaQcgwAPCQF8BY2h4'
        b'DDGwGgfIGhACzAwMkgIKAAABAwABAAAAPAAAAAEBAwABAAAAGAAAAAIBAwADAAAA'
        b'HBYAAAMBAwABAAAABQAAAAYBAwABAAAAAgAAABEBBAADAAAAKBYAABUBAwABAAAA'
        b'AwAAABYBAwABAAAACAAAABcBAwADAAAAIhYAABwBAwABAAAAAQAAAAAAAAAIAAgA'
        b'CAA0BzIHMAcIAAAAPAcAAG4OAAA='
        , "439dd80153c34b3993e5249f4041dfc3", (24, 60, 3)),
    "lzw_pred2_gray": (
        b'SUkqAIYAAACAAACwOCQWDQeEQmFQWBQuHQ+IQOGxGKRWJRaMRGJxmOQiNx2QReQy'
        b'MCx+SRmAgIAAALA4JBYNB4RCYVBYFC4dD4hA4bEYpFYlFoxEYnGY5CI3HZBF5DIw'
        b'LH5JGYCAgAAAsDgkFg0HhEJhUFgULh0PiEDhsRikViUWjERgIAALAAABAwABAAAA'
        b'MgAAAAEBAwABAAAAFAAAAAIBAwABAAAACAAAAAMBAwABAAAABQAAAAYBAwABAAAA'
        b'AQAAABEBBAADAAAAFgEAABUBAwABAAAAAQAAABYBAwABAAAACAAAABcBAwADAAAA'
        b'EAEAABwBAwABAAAAAQAAAD0BAwABAAAAAgAAAAAAAAAvAC8AHwAIAAAANwAAAGYA'
        b'AAA='
        , "aa4cdd1161f7db03aad75ca76790a273", (20, 50, 1)),
    "packbits_gray": (
        b'SUkqAGABAAATAPCgUKAAoPAA8ACg8KDwoFCgAKD/UP/wDlAAAKAA8ACgUKAAoACg'
        b'8P9Q/wAA8AtQAADwUFDwoKBQ8FD/oP7wAlCgAP/wC/BQoAAAUPCgoADwUP+g/wAD'
        b'oPDwoP8AAgCg8P6gD1DwoADwAFCgUFAAUKCgUKAV8FDwAABQoKBQ8KBQoKAA8FAA'
        b'AFCgAAnwoKAAUFDwUFCg/lAIAKAAUFAA8KAA/lD+oP9QDaBQ8PAA8PAAoFBQAKBQ'
        b'CFDwoKBQ8ACgUP6gCfBQ8FCgoFCgUAAVAFDwoABQUKAAAPAAUKDwoPDwUACg8A6g'
        b'UACgUKDw8ACgUFCg8KD98P4A/1AToFDw8ACg8ADw8KAA8PBQAKCgUKAG8ADwAFAA'
        b'UP+g/1D/8AGgUP/w/1ACoFCgFVDwAKCgAPBQUPCg8ABQAADwoFDwUKAVoFDwoPBQ'
        b'UPCgAKAAoAAA8KBQoKAAUAoAAAEDAAEAAAAWAAAAAQEDAAEAAAAPAAAAAgEDAAEA'
        b'AAAIAAAAAwEDAAEAAAAFgAAABgEDAAEAAAABAAAAEQEEAAIAAADmAQAAFQEDAAEA'
        b'AAABAAAAFgEDAAEAAAAIAAAAFwEEAAIAAADeAQAAHAEDAAEAAAABAAAAAAAAALgA'
        b'AACgAAAACAAAAMAAAAA='
        , "5e263673b7e2824986c0e605307484bc", (15, 22, 1)),
}


@pytest.mark.parametrize("name", sorted(KAT))
def test_libtiff_known_answer_vectors(name):
    b64, digest, shape = KAT[name]
    px = decode_tiff(base64.b64decode(b64))
    assert px.shape == shape
    assert hashlib.sha256(px.tobytes()).hexdigest()[:32] == digest


# ---------------------------------------------------------------------------
# libtiff via ctypes (in-memory TIFFClientOpen stream).
# ---------------------------------------------------------------------------

_READ = C.CFUNCTYPE(C.c_ssize_t, C.c_void_p, C.c_void_p, C.c_ssize_t)
_WRITE = C.CFUNCTYPE(C.c_ssize_t, C.c_void_p, C.c_void_p, C.c_ssize_t)
_SEEK = C.CFUNCTYPE(C.c_uint64, C.c_void_p, C.c_uint64, C.c_int)
_CLOSE = C.CFUNCTYPE(C.c_int, C.c_void_p)
_SIZE = C.CFUNCTYPE(C.c_uint64, C.c_void_p)
_MAP = C.CFUNCTYPE(C.c_int, C.c_void_p, C.POINTER(C.c_void_p),
                   C.POINTER(C.c_uint64))
_UNMAP = C.CFUNCTYPE(None, C.c_void_p, C.c_void_p, C.c_uint64)

_TAG = {"width": 256, "length": 257, "bps": 258, "comp": 259,
        "photo": 262, "spp": 277, "rps": 278, "planar": 284,
        "predictor": 317}


class _LibTiff:
    def __init__(self, lib: C.CDLL) -> None:
        lib.TIFFClientOpen.restype = C.c_void_p
        lib.TIFFClientOpen.argtypes = [
            C.c_char_p, C.c_char_p, C.c_void_p,
            _READ, _WRITE, _SEEK, _CLOSE, _SIZE, _MAP, _UNMAP]
        lib.TIFFClose.argtypes = [C.c_void_p]
        lib.TIFFReadRGBAImageOriented.restype = C.c_int
        lib.TIFFReadRGBAImageOriented.argtypes = [
            C.c_void_p, C.c_uint32, C.c_uint32,
            C.POINTER(C.c_uint32), C.c_int, C.c_int]
        lib.TIFFWriteScanline.restype = C.c_int
        lib.TIFFWriteScanline.argtypes = [C.c_void_p, C.c_void_p,
                                          C.c_uint32, C.c_uint16]
        # varargs: declare the fixed prefix (see module docstring)
        lib.TIFFGetField.restype = C.c_int
        lib.TIFFGetField.argtypes = [C.c_void_p, C.c_uint32]
        lib.TIFFSetField.restype = C.c_int
        lib.TIFFSetField.argtypes = [C.c_void_p, C.c_uint32]
        lib.TIFFSetErrorHandler.restype = C.c_void_p
        lib.TIFFSetWarningHandler.restype = C.c_void_p
        lib.TIFFSetErrorHandler(None)
        lib.TIFFSetWarningHandler(None)
        self.lib = lib

    class _Stream:
        def __init__(self, data: bytes = b""):
            self.buf = bytearray(data)
            self.pos = 0
            self.read = _READ(self._read)
            self.write = _WRITE(self._write)
            self.seek = _SEEK(self._seek)
            self.close = _CLOSE(lambda h: 0)
            self.size = _SIZE(lambda h: len(self.buf))
            self.map = C.cast(None, _MAP)
            self.unmap = C.cast(None, _UNMAP)

        def _read(self, h, buf, n):
            chunk = bytes(self.buf[self.pos:self.pos + n])
            C.memmove(buf, chunk, len(chunk))
            self.pos += len(chunk)
            return len(chunk)

        def _write(self, h, buf, n):
            data = C.string_at(buf, n)
            end = self.pos + n
            if end > len(self.buf):
                self.buf.extend(b"\x00" * (end - len(self.buf)))
            self.buf[self.pos:end] = data
            self.pos = end
            return n

        def _seek(self, h, off, whence):
            if whence == 0:
                self.pos = off
            elif whence == 1:
                self.pos += off
            else:
                self.pos = len(self.buf) + off
            return self.pos

    def _open(self, st, mode: str):
        tif = self.lib.TIFFClientOpen(
            b"mem", mode.encode(), None, st.read, st.write, st.seek,
            st.close, st.size, st.map, st.unmap)
        assert tif, "TIFFClientOpen failed"
        return tif

    def decode_rgba(self, data: bytes) -> np.ndarray:
        st = self._Stream(data)
        tif = self._open(st, "r")
        w = C.c_uint32()
        h = C.c_uint32()
        assert self.lib.TIFFGetField(tif, _TAG["width"], C.byref(w))
        assert self.lib.TIFFGetField(tif, _TAG["length"], C.byref(h))
        raster = (C.c_uint32 * (w.value * h.value))()
        ok = self.lib.TIFFReadRGBAImageOriented(tif, w, h, raster, 1, 0)
        self.lib.TIFFClose(tif)
        assert ok, "TIFFReadRGBAImageOriented failed"
        v = np.frombuffer(raster, np.uint32).reshape(h.value, w.value)
        out = np.empty((h.value, w.value, 4), np.uint8)
        out[..., 0] = v & 0xFF
        out[..., 1] = (v >> 8) & 0xFF
        out[..., 2] = (v >> 16) & 0xFF
        out[..., 3] = (v >> 24) & 0xFF
        return out

    def encode(self, arr: np.ndarray, compression: int = 1,
               rows_per_strip: int = 8, predictor: int = 0) -> bytes:
        h, w = arr.shape[:2]
        spp = 1 if arr.ndim == 2 else arr.shape[2]
        st = self._Stream()
        tif = self._open(st, "w")
        f = self.lib.TIFFSetField
        assert f(tif, _TAG["width"], C.c_uint32(w))
        assert f(tif, _TAG["length"], C.c_uint32(h))
        assert f(tif, _TAG["bps"], C.c_int(8))
        assert f(tif, _TAG["spp"], C.c_int(spp))
        assert f(tif, _TAG["photo"], C.c_int(1 if spp == 1 else 2))
        assert f(tif, _TAG["planar"], C.c_int(1))
        assert f(tif, _TAG["comp"], C.c_int(compression))
        assert f(tif, _TAG["rps"], C.c_uint32(rows_per_strip))
        if predictor:
            assert f(tif, _TAG["predictor"], C.c_int(predictor))
        buf = np.ascontiguousarray(arr, np.uint8)
        for y in range(h):
            row = np.ascontiguousarray(buf[y])
            assert self.lib.TIFFWriteScanline(
                tif, row.ctypes.data_as(C.c_void_p), y, 0) == 1
        self.lib.TIFFClose(tif)
        return bytes(st.buf)


@pytest.fixture(scope="module")
def libtiff():
    for name in ("libtiff.so.6", "libtiff.so",
                 ctypes.util.find_library("tiff")):
        if not name:
            continue
        try:
            return _LibTiff(C.CDLL(name))
        except OSError:
            continue
    pytest.skip("system libtiff not available")


def _rgb3(arr: np.ndarray) -> np.ndarray:
    if arr.ndim == 3 and arr.shape[2] == 3:
        return arr
    return np.repeat(arr.reshape(arr.shape[0], arr.shape[1], 1), 3, 2)


def test_interop_libtiff_decodes_ours(libtiff):
    """Direction A: libtiff must recover exact pixels from every
    (compression x byte-order) combination our encoder emits —
    including LZW strips large enough to cross the 9->10-bit width
    boundary, the transition the pre-interop codec got wrong."""
    rng = np.random.default_rng(5)
    imgs = [
        rng.integers(0, 256, (21, 33, 3), dtype=np.uint8),
        rng.integers(0, 256, (40, 70, 3), dtype=np.uint8),  # boundary
        rng.integers(0, 256, (17, 13), dtype=np.uint8),     # gray
    ]
    for arr in imgs:
        for comp in (1, 5, 32773):
            for bo in ("II", "MM"):
                data = encode_tiff(arr, compression=comp, byte_order=bo)
                got = libtiff.decode_rgba(data)
                assert np.array_equal(got[:, :, :3], _rgb3(arr)), \
                    (arr.shape, comp, bo)


def test_interop_we_decode_libtiff(libtiff):
    """Direction B: exact pixels from TIFFWriteScanline streams —
    libtiff's own LZW emission (incl. its table-reset policy on
    multi-kilobyte strips), PackBits, and multi-strip layouts."""
    rng = np.random.default_rng(7)
    imgs = [
        rng.integers(0, 256, (21, 33, 3), dtype=np.uint8),
        rng.integers(0, 256, (60, 120), dtype=np.uint8),
        (rng.integers(0, 4, (15, 22), dtype=np.uint8) * 80),
    ]
    for arr in imgs:
        for comp in (1, 5, 32773):
            for rps in (4, 64):
                data = libtiff.encode(arr, compression=comp,
                                      rows_per_strip=rps)
                mine = decode_tiff(data)
                assert np.array_equal(_rgb3(mine.squeeze()
                                             if mine.shape[2] == 1
                                             else mine), _rgb3(arr)), \
                    (arr.shape, comp, rps)


def test_interop_we_decode_libtiff_predictor2(libtiff):
    """Horizontal-differencing predictor (tag 317 = 2) with LZW, gray
    and RGB: the per-sample wrapping cumulative sum must reproduce
    libtiff's reconstruction exactly."""
    y, x = np.mgrid[0:20, 0:50]
    gray = ((x * 5) % 256).astype(np.uint8)
    rng = np.random.default_rng(8)
    rgb = np.clip(
        np.dstack([x * 3, y * 7, x + y]) % 256
        + rng.integers(0, 9, (20, 50, 3)), 0, 255
    ).astype(np.uint8)
    for arr in (gray, rgb):
        data = libtiff.encode(arr, compression=5, predictor=2)
        mine = decode_tiff(data)
        ref = libtiff.decode_rgba(data)
        assert np.array_equal(_rgb3(mine.squeeze()
                                     if mine.shape[2] == 1 else mine),
                              ref[:, :, :3])


def test_lzw_boundary_roundtrip_still_selfconsistent():
    """Regression pin for the fixed width thresholds: a strip of
    incompressible bytes large enough to reach 12-bit codes and force
    a table reset must round-trip through our own encoder/decoder
    (the interop tests above pin the same bytes against libtiff)."""
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, (80, 120, 3), dtype=np.uint8)
    data = encode_tiff(arr, compression=5, rows_per_strip=80)
    assert np.array_equal(decode_tiff(data), arr)
