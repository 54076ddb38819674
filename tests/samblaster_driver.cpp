// Oracle driver for the vendored samblaster library.
//
// Mirrors how the reference drives samblaster (MarkDupStage::compute +
// InitializeState, /root/reference/src/MarkDupStage.cpp:49-172): SAM
// text in on stdin, consecutive same-QNAME records grouped into a
// block, one splitLine per READ (the first record of each end — the
// bams[0] the reference feeds), markDupsDiscordants() marks, and every
// record of a marked read gets FLAG |= 1024 on stdout (markDupSeq).
// Only the library (samblaster.cpp / sbhash.cpp) is reference code —
// copied into .cache/oracle at build time, never committed.
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "samblaster.h"

static int sam_flag(const std::string &s) {
    size_t t = s.find('\t');
    return atoi(s.c_str() + t + 1);
}

static std::string qname(const std::string &s) {
    return s.substr(0, s.find('\t'));
}

static splitLine_t *to_split(const std::string &s) {
    splitLine_t *sl = getSplitLine();
    size_t need = s.size() + 2;
    if (need > sl->maxBufLen) resizeSplitLine(sl, (int)need);
    memcpy(sl->buffer, s.c_str(), s.size());
    sl->buffer[s.size()] = '\n';
    sl->buffer[s.size() + 1] = 0;
    sl->bufLen = (int)s.size() + 1;
    splitSplitLine(sl, 12);
    return sl;
}

int main() {
    state_t *st = makeState();
    st->ignoreUnmated = true;   // the CLI stage's contract; avoids the
                                // brokenBlock fatal on stray singletons
    std::vector<std::pair<std::string, unsigned long long>> sq;
    std::vector<std::string> body;
    char *buf = nullptr;
    size_t cap = 0;
    ssize_t n;
    while ((n = getline(&buf, &cap, stdin)) > 0) {
        if (n && buf[n - 1] == '\n') buf[n - 1] = 0;
        if (buf[0] == '@') {
            printf("%s\n", buf);
            if (!strncmp(buf, "@SQ", 3)) {
                char *sn = strstr(buf, "SN:");
                char *ln = strstr(buf, "LN:");
                if (sn && ln)
                    sq.push_back({std::string(sn + 3,
                                              strcspn(sn + 3, "\t")),
                                  strtoull(ln + 3, nullptr, 10)});
            }
        } else if (buf[0]) {
            body.push_back(buf);
        }
    }

    // state init exactly as MarkDupStage::InitializeState (including
    // the "*"-shares-slot-0 layout)
    size_t nsq = sq.size() ? sq.size() : 1;
    st->seqLens = (UINT32 *)calloc(nsq + 1, sizeof(UINT32));
    st->seqOffs = (UINT64 *)calloc(nsq + 1, sizeof(UINT64));
    st->seqs[strdup("*")] = 0;
    st->seqLens[0] = padLength(0);
    st->seqOffs[0] = 0;
    UINT64 totalLen = 0;
    for (size_t i = 0; i < sq.size(); i++) {
        st->seqs[strdup(sq[i].first.c_str())] = (int)i;
        st->seqLens[i] = (UINT32)sq[i].second;
        st->seqOffs[i] = totalLen;
        totalLen += sq[i].second + 1;
    }
    int binCount = (int)(totalLen >> BIN_SHIFT);
    st->binCount = binCount;
    st->sigArraySize =
        (UINT32)((binCount * 2 + 1) * (binCount * 2 + 1) + 1);
    st->sigs = new sigSet_t[st->sigArraySize];

    size_t i = 0;
    while (i < body.size()) {
        size_t j = i;
        std::string qn = qname(body[i]);
        while (j < body.size() && qname(body[j]) == qn) j++;
        int first_of_end[3] = {-1, -1, -1};  // 0=SE, 1=first, 2=second
        std::vector<int> ends(j - i);
        for (size_t k = i; k < j; k++) {
            int fl = sam_flag(body[k]);
            int e = (fl & 0x40) ? 1 : (fl & 0x80) ? 2 : 0;
            ends[k - i] = e;
            if (first_of_end[e] < 0) first_of_end[e] = (int)k;
        }
        splitLine_t *head = nullptr, *tail = nullptr;
        std::vector<splitLine_t *> lines;
        std::vector<int> which;
        for (size_t k = i; k < j; k++) {
            if ((int)k != first_of_end[ends[k - i]]) continue;
            splitLine_t *sl = to_split(body[k]);
            if (!head) head = tail = sl;
            else { tail->next = sl; tail = sl; }
            lines.push_back(sl);
            which.push_back(ends[k - i]);
        }
        if (head) markDupsDiscordants(head, st);
        bool dup[3] = {false, false, false};
        for (size_t k = 0; k < lines.size(); k++)
            if (lines[k]->flag & 1024) dup[which[k]] = true;
        for (size_t k = i; k < j; k++) {
            const std::string &s = body[k];
            int fl = sam_flag(s);
            if (dup[ends[k - i]]) fl |= 1024;
            size_t t1 = s.find('\t');
            size_t t2 = s.find('\t', t1 + 1);
            printf("%.*s%d%s\n", (int)(t1 + 1), s.c_str(), fl,
                   s.c_str() + t2);
        }
        if (head) disposeSplitLines(head);
        i = j;
    }
    return 0;
}
