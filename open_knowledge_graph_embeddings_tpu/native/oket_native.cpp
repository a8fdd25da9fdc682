// Native runtime components: fast mapped-to-ids dataset parsing.
//
// The reference's first-run indexing of OLPBench (~30M lines of 5-col text)
// takes ~30 minutes in python (reference README.md:74; the sort+group in
// openkge/dataset.py:481-518).  This parser streams the file once with
// hand-rolled integer scanning at ~GB/s, filling preallocated numpy buffers
// through a two-pass (count, fill) ctypes interface.
//
// Format per line (reference openkge/default.yaml:100-150):
//   subj_id \t rel_id \t obj_id \t subj_mention_ids(space sep) \t obj_mention_ids
//
// Build: g++ -O3 -march=native -shared -fPIC (see native/build.py); no
// external dependencies.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {

// Returns 0 on success. Counts lines with >= 3 fields and the total number
// of subject/object mention ids.
int oket_count_5col(const char* path, int64_t* n_triples, int64_t* n_subj_vals,
                    int64_t* n_obj_vals) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  const size_t BUF = 1 << 22;
  char* buf = (char*)malloc(BUF);
  if (!buf) { fclose(f); return 2; }

  int64_t triples = 0, svals = 0, ovals = 0;
  int field = 0;            // current tab-separated field index
  bool in_number = false;   // currently inside a digit run
  int64_t s_line = 0, o_line = 0;  // mention counts on this line

  auto end_line = [&](int last_field) {
    if (last_field >= 2) {
      triples++;
      // 3-col closed-KG lines duplicate cols 1/3 into the mention lists
      svals += (s_line == 0) ? 1 : s_line;
      ovals += (o_line == 0) ? 1 : o_line;
    }
    field = 0;
    s_line = o_line = 0;
  };

  size_t got;
  while ((got = fread(buf, 1, BUF, f)) > 0) {
    for (size_t i = 0; i < got; i++) {
      char c = buf[i];
      if (c >= '0' && c <= '9') {
        if (!in_number) {
          in_number = true;
          if (field == 3) s_line++;
          else if (field == 4) o_line++;
        }
      } else {
        in_number = false;
        if (c == '\t') {
          field++;
        } else if (c == '\n') {
          end_line(field);
        }
      }
    }
  }
  // last line without trailing newline
  end_line(field);
  free(buf);
  fclose(f);
  *n_triples = triples;
  *n_subj_vals = svals;
  *n_obj_vals = ovals;
  return 0;
}

// Fill preallocated buffers:
//   triples   [n_triples * 3] int32
//   s_off     [n_triples + 1] int64 (CSR offsets; s_off[0] must be 0)
//   s_val     [n_subj_vals]   int32
//   o_off     [n_triples + 1] int64
//   o_val     [n_obj_vals]    int32
// Lines with fewer than 5 fields duplicate cols 1/3 into the mention lists
// (closed-KG convention).  Returns number of triples written, or -1 on error.
int64_t oket_parse_5col(const char* path, int32_t* triples, int64_t* s_off,
                        int32_t* s_val, int64_t* o_off, int32_t* o_val) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  const size_t BUF = 1 << 22;
  char* buf = (char*)malloc(BUF);
  if (!buf) { fclose(f); return -1; }

  int64_t t = 0, si = 0, oi = 0;
  int field = 0;
  int64_t cur = -1;  // current number being scanned, -1 = none
  int32_t cols[3] = {0, 0, 0};
  int subj_count_this_line = 0, obj_count_this_line = 0;
  s_off[0] = 0;
  o_off[0] = 0;

  auto end_number = [&]() {
    if (cur < 0) return;
    if (field < 3) {
      if (field >= 0 && field <= 2) cols[field] = (int32_t)cur;
    } else if (field == 3) {
      s_val[si++] = (int32_t)cur;
      subj_count_this_line++;
    } else if (field == 4) {
      o_val[oi++] = (int32_t)cur;
      obj_count_this_line++;
    }
    cur = -1;
  };
  auto end_line = [&](int last_field) {
    if (last_field < 2) {  // blank/malformed line
      field = 0;
      cur = -1;
      subj_count_this_line = obj_count_this_line = 0;
      return;
    }
    triples[t * 3 + 0] = cols[0];
    triples[t * 3 + 1] = cols[1];
    triples[t * 3 + 2] = cols[2];
    if (subj_count_this_line == 0) { s_val[si++] = cols[0]; subj_count_this_line = 1; }
    if (obj_count_this_line == 0) { o_val[oi++] = cols[2]; obj_count_this_line = 1; }
    s_off[t + 1] = si;
    o_off[t + 1] = oi;
    t++;
    field = 0;
    cur = -1;
    subj_count_this_line = obj_count_this_line = 0;
  };

  size_t got;
  while ((got = fread(buf, 1, BUF, f)) > 0) {
    for (size_t i = 0; i < got; i++) {
      char c = buf[i];
      if (c >= '0' && c <= '9') {
        cur = (cur < 0 ? 0 : cur) * 10 + (c - '0');
      } else if (c == '\t') {
        end_number();
        field++;
      } else if (c == '\n') {
        end_number();
        end_line(field);
      } else {
        end_number();
      }
    }
  }
  end_number();
  if (field >= 2) end_line(field);
  free(buf);
  fclose(f);
  return t;
}

}  // extern "C"
