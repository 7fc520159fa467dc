#!/usr/bin/env python3
"""Run the REFERENCE's own ETL (exec'd at runtime from /root/reference —
never copied into this repo) on its CSV, dump the cleaned table + golden
aggregates. Used offline to derive the assertions in HealthSpec and to
diff the Spark ETL output cell-by-cell.

Usage: python3 tools/health_oracle.py <out_dir> [spark_cleaned_parquet]
"""
import json, sys, os

import numpy as np
import pandas as pd


def load_reference_etl():
    nb = json.load(open('/root/reference/HEALTH ETL PIPELINE4.ipynb'))
    src = ''.join(nb['cells'][0]['source'])
    # drop imports of viz/db libs this container lacks; the ETL only needs
    # pandas/numpy/re/pathlib, all present
    src = '\n'.join(l for l in src.splitlines()
                    if not (l.startswith('import plotly') or
                            l.startswith('import matplotlib') or
                            l.startswith('import seaborn')))
    src = src.split('# Access Database')[0]  # drop module-level sqlite tail
    g = {'__name__': 'nb_cell0'}
    exec(compile(src, 'nb_cell0', 'exec'), g)  # defines clean_health_dataset
    return g['clean_health_dataset']


def main():
    out = sys.argv[1]
    os.makedirs(out, exist_ok=True)
    os.chdir(out)  # reference function writes its CSV into cwd
    clean = load_reference_etl()
    df = clean('/root/reference/Global Health Dataset.csv',
               output_path=os.path.join(out, 'cleaned_ref.csv'))
    if df is None:  # Health_Jim.py variant returns None; notebook returns df
        df = pd.read_csv(os.path.join(out, 'cleaned_ref.csv'))
    df.to_parquet(os.path.join(out, 'cleaned_ref.parquet'))
    print('shape:', df.shape)
    print('columns:', list(df.columns))
    print('n_countries:', df['Country'].nunique(), sorted(df['Country'].unique()))
    print('n_diseases:', df['Disease Name'].nunique(), sorted(df['Disease Name'].unique()))
    print('nulls:', int(df.isna().sum().sum()))

    # A1 top deadliest (nb:cell2)
    a1 = (df[df['Mortality_Rate_per_100'].notna()]
          .groupby('Disease Name')
          .agg(avg_mortality=('Mortality_Rate_per_100', 'mean'),
               total_records=('Mortality_Rate_per_100', 'size'))
          .sort_values('avg_mortality', ascending=False).head(5))
    print('A1:', a1.round(6).to_dict())

    # A3 healthcare access vs mortality by country (nb:cell10)
    a3 = (df.groupby('Country')
          .agg(avg_healthcare_access=('Healthcare_Access_Pct', 'mean'),
               avg_mortality=('Mortality_Rate_per_100', 'mean'),
               avg_doctors=('Doctors_per_1000', 'mean'))
          .dropna(subset=['avg_mortality'])
          .sort_values('avg_healthcare_access', ascending=False))
    print('A3 head:', a3.head(3).round(6).to_dict())
    print('A3 tail:', a3.tail(3).round(6).to_dict())

    # A4 treatment cost by disease & type (nb:cell14)
    a4 = (df[df['Avg_Treatment_Cost_USD'].notna()]
          .groupby(['Disease Name', 'Treatment_Type'])
          .agg(avg_cost=('Avg_Treatment_Cost_USD', 'mean'),
               avg_recovery=('Recovery_Rate', 'mean'),
               cases=('Avg_Treatment_Cost_USD', 'size'))
          .sort_values('avg_cost', ascending=False))
    print('A4 head:', a4.head(3).round(6).to_dict())

    # A5 gender (nb:cell18)
    a5 = (df.groupby('Disease Name')
          .agg(avg_mortality=('Mortality_Rate_per_100', 'mean'),
               male=('Affected_Male', 'sum'), female=('Affected_Female', 'sum'))
          .sort_values('avg_mortality', ascending=False).head(10))
    print('A5:', a5.round(4).to_dict())

    # A2 recovery trends (nb:cell6)
    a2 = (df.groupby(['Year', 'Disease Name'])
          .agg(cases=('Recovery_Rate', 'size'), avg_recovery=('Recovery_Rate', 'mean'))
          .reset_index()
          .sort_values(['avg_recovery', 'cases'], ascending=[True, False]).head(5))
    print('A2:', a2.round(6).to_dict('records'))

    if len(sys.argv) > 2:
        import re as _re
        sp = pd.read_parquet(sys.argv[2])
        print('\n--- Spark vs pandas oracle ---')
        print('spark shape:', sp.shape)
        # Spark dump sanitizes parquet-hostile chars in column names
        df = df.rename(columns={c: _re.sub(r'[ ,;{}()=%:]', '_', c) for c in df.columns})
        common = [c for c in df.columns if c in sp.columns]
        key = ['Row_num']  # unique per row; Record_ID ties differ (unstable pandas sort)
        a = df[common].sort_values(key).reset_index(drop=True)
        b = sp[common].sort_values(key).reset_index(drop=True)
        for c in common:
            if np.issubdtype(a[c].dtype, np.number):
                ok = np.allclose(a[c].astype(float), b[c].astype(float),
                                 rtol=0, atol=0, equal_nan=True)
                if not ok:
                    d = (a[c].astype(float) - b[c].astype(float)).abs()
                    print(f'DIFF {c}: {int((d > 0).sum())} cells, max {d.max():.6g}; '
                          f'first idx {int(d.idxmax())} a={a[c][d.idxmax()]} b={b[c][d.idxmax()]}')
            else:
                neq = (a[c].fillna("\x00") != b[c].fillna("\x00"))
                if neq.any():
                    i = int(neq.idxmax())
                    print(f'DIFF {c}: {int(neq.sum())} cells; first a={a[c][i]!r} b={b[c][i]!r}')
        print('compare done')


if __name__ == '__main__':
    main()
